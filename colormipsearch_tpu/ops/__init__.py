"""TPU device kernels (JAX/XLA/Pallas) for color depth search."""
