"""Sources: deterministic synthetic inputs and geo-column derivations."""
