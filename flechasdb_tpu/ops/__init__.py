"""TPU compute kernels (JAX/XLA/Pallas)."""
