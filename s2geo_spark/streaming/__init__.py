"""Structured-streaming surface of the engine."""
