"""Device operator kernels (JAX/XLA/Pallas) for the exon-tpu query engine."""
