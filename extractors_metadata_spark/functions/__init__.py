"""NumPy scalar kernels used inside pandas/Arrow UDFs (never per-row Python)."""
