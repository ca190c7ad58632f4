"""detection_3d_tpu — TPU-native 3D building-primitive detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
Detection_3D stack (maskrcnn_benchmark + SparseConvNet + SECOND fork):
sparse-voxel 3D detection of building primitives (wall / window / door /
ceiling / floor) in indoor point clouds, producing 7-DoF rotated boxes.

Design stance (TPU-first, not a port):
  * one functional pipeline ``voxelize -> sparse backbone -> RPN -> ROI ->
    decode/NMS`` fully jittable with static shapes + validity masks;
  * rotated IoU and NMS run fully on device (the reference round-trips
    host<->device three times per forward);
  * sparse convolution is gather-GEMM-scatter over a sorted voxel table
    (MXU matmuls), not a CPU hash rulebook;
  * multi-building batching shards over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"
