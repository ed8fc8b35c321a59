"""Pallas TPU kernels (wavefront DP, pileup scatter-add, PWM scan, ...)."""
