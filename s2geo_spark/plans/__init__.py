"""Planning helpers: density pre-pass, skew splitting/salting, manifest."""
