"""Performance kernels for the hot ops (Pallas / fused XLA)."""
