"""TPU-native operator kernels (Pallas + XLA reference implementations)."""
