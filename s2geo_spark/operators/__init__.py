"""DataFrame-level spatial operators (joins, coverings, kNN, dedup, text)."""
