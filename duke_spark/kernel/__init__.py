"""Pure (no-Spark) kernels shared by the Spark operators and the NumPy oracle."""
