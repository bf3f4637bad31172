from gecco_tpu.models.activation import GaussianActivation
from gecco_tpu.models.convnext import (
    ConvNeXt,
    ConvNeXtExtractor,
    FeaturePyramidContext,
    load_torchvision_state_dict,
)
from gecco_tpu.models.embed import LinearSpaceEmbedding, LinearTimeEmbedding
from gecco_tpu.models.gpt_init import gpt_init
from gecco_tpu.models.mlp import MLP
from gecco_tpu.models.normalization import AdaGN, AdaLN
from gecco_tpu.models.set_transformer import (
    AttentionPool,
    Broadcast,
    BroadcastingLayer,
    SetTransformer,
    Unpool,
)
from gecco_tpu.models.wrappers import (
    GlobalConditioningNetwork,
    LinearLift,
    RayNetwork,
    UnconditionalPointNetwork,
)

__all__ = [
    "GaussianActivation",
    "ConvNeXt",
    "ConvNeXtExtractor",
    "FeaturePyramidContext",
    "load_torchvision_state_dict",
    "LinearSpaceEmbedding",
    "gpt_init",
    "LinearTimeEmbedding",
    "MLP",
    "AdaGN",
    "AdaLN",
    "AttentionPool",
    "Broadcast",
    "BroadcastingLayer",
    "SetTransformer",
    "Unpool",
    "GlobalConditioningNetwork",
    "LinearLift",
    "RayNetwork",
    "UnconditionalPointNetwork",
]
