"""tinyedm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) EDM/EDM2 diffusion framework.

Re-designed from-scratch with the capabilities of YichengDWu/tinyedm (the
reference's public API surface is mirrored at src/tinyedm/__init__.py:1-9,
including the reference's `PreditionWriter` [sic] spelling).
"""

from tinyedm_tpu.diffusion.diffuser import Diffuser
from tinyedm_tpu.diffusion.loss import WeightedMeanSquaredError
from tinyedm_tpu.diffusion.solver import DeterministicSolver, StochasticSolver
from tinyedm_tpu.models.edm import EDM
from tinyedm_tpu.models.layers import (
    ClassEmbedding,
    CosineAttention,
    Embedding,
    FourierEmbedding,
    ScaleLong,
    UncertaintyNet,
    WNConv,
    WNLinear,
)
from tinyedm_tpu.models.unet import Denoiser, DenoiserWrapper
from tinyedm_tpu.training.callbacks import (
    GenerateCallback,
    LatentsGenerateCallback,
    PreditionWriter,
)

# Reference-API aliases (src/tinyedm/__init__.py exports Linear/Conv2d)
Linear = WNLinear
Conv2d = WNConv

__all__ = [
    "EDM",
    "Diffuser",
    "GenerateCallback",
    "PreditionWriter",
    "LatentsGenerateCallback",
    "DeterministicSolver",
    "StochasticSolver",
    "WeightedMeanSquaredError",
    "Denoiser",
    "DenoiserWrapper",
    "Linear",
    "Conv2d",
    "WNLinear",
    "WNConv",
    "Embedding",
    "FourierEmbedding",
    "ClassEmbedding",
    "CosineAttention",
    "ScaleLong",
    "UncertaintyNet",
]

__version__ = "0.1.0"
