"""Pure-Python per-row kernels (no Ray imports)."""
