"""hspose_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for category-level
6D object pose + size estimation, with the full capabilities of HS-Pose (CVPR 2023).

Not a port: typed config, pure functions with explicit PRNG/state threading, fixed
shapes end-to-end, a single jitted train step, data parallelism over a
``jax.sharding.Mesh``, and Pallas kernels for the hot ops (KNN, neighbor gather,
chamfer distance).  See SURVEY.md for the structural map of the reference.
"""

import jax as _jax

# f32-accurate matmuls by default: the pose math lives in 3×3 rotation algebra and
# N² KNN distances where the TPU bf16 default quantum (~1e-2) is catastrophic.
# 'high' (bf16x3) carries ~f32 accuracy at 2× the speed of 'highest' (6-pass);
# the few places that need bit-exactness (KNN distances, one-hot gathers) pin
# Precision.HIGHEST explicitly.
_jax.config.update("jax_default_matmul_precision", "high")

from hspose_tpu.config import HSPoseConfig, default_config

__version__ = "0.1.0"
__all__ = ["HSPoseConfig", "default_config", "__version__"]
