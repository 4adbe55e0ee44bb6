"""mipnerf360_tpu — a TPU-native (JAX/XLA/Pallas/pjit) Mip-NeRF 360 framework.

Built from scratch against the behavior of zhangkai0425/mipnerf360 (see
SURVEY.md for the component map); all compute paths are pure-functional JAX
compiled by XLA, with Pallas kernels for the fused hot ops and
``jax.sharding`` meshes for multi-chip/multi-host scaling.
"""

__version__ = "0.1.0"

from .config import Config, ModelConfig, TrainConfig, DataConfig, MeshConfig, get_config
