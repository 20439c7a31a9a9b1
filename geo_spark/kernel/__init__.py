"""Pure-numpy geometry kernels (no Spark imports)."""
