"""Batched geometry + vision kernels (the TPU-native "ops layer").

Replaces the reference's L1/L3 compute stack — Sophus SE3, OpenCV
FAST/LK/PnP, the custom g2o vertices/edges, and the hand-rolled ORB
extractor — with fixed-shape, jittable JAX/Pallas kernels.
"""
