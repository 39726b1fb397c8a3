"""facebook360_dep_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the
Facebook360 Depth Estimation Pipeline (facebook/facebook360_dep).

Camera-rig calibration, multi-view disparity estimation, and 6DoF
streaming/rendering, re-designed for TPU: plane-sweep cost volumes as fused
vector ops over HBM-resident image stacks, coarse-to-fine pyramids on device,
and `jax.sharding` meshes for camera/frame parallelism.
"""

__version__ = "0.1.0"
