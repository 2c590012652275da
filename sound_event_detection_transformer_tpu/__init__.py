"""TPU-native Sound Event Detection Transformer framework.

A from-scratch JAX/XLA/Pallas/pjit re-design with the capability surface of
the PyTorch reference (Anaesthesiaye/sound_event_detection_transformer):
SEDT supervised training, SP-SEDT self-supervised pretraining, and the
semi-supervised mean-teacher system.  See README.md for the architecture map.
"""
from .config import (
    AugmentConfig,
    DataConfig,
    FeatureConfig,
    LossConfig,
    MeshConfig,
    ModelConfig,
    SEDTConfig,
    TrainConfig,
)

__version__ = "0.1.0"

__all__ = [
    "SEDTConfig",
    "FeatureConfig",
    "ModelConfig",
    "LossConfig",
    "DataConfig",
    "AugmentConfig",
    "TrainConfig",
    "MeshConfig",
    "__version__",
]
