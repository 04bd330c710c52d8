"""Device-side compute ops (JAX/XLA/Pallas): the TPU-native kernel tier.

Replaces the reference's CUDA custom ops and C++ geometry libraries
(SURVEY.md section 2.4): NMS/top-k detection, bilinear descriptor sampling,
attention blocks, NN descriptor matching, and batched RANSAC.
"""
