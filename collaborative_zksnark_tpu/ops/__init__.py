"""TPU compute kernels: NTT, MSM, curve ops, Pallas field kernels."""
