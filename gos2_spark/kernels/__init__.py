"""Pure-numpy vectorized kernels (no Spark imports here — importable on executors)."""
