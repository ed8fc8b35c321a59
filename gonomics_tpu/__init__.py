"""gonomics_tpu — a TPU-native sequence-analysis framework.

Brand-new JAX/XLA/Pallas re-design with the capabilities of
vertgenlab/gonomics (reference mounted at /root/reference; see SURVEY.md).
Compute-heavy paths (pairwise DP, seed-and-extend alignment, pileup
reduction, Felsenstein pruning, PWM scans) run as batched TPU kernels;
record formats and streaming IO run on the host.
"""

__version__ = "0.1.0"
