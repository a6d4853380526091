"""Deep loop-closure descriptor models."""
