"""IO, metrics, profiling, and dataset utilities."""
