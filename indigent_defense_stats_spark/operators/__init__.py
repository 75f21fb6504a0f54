"""Engine operators: parse, clean, publish, analytics, dedup, similarity."""
