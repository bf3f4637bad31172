from gecco_tpu.ops.attention import rect_attention
from gecco_tpu.ops.norms import group_norm, layer_norm

__all__ = ["rect_attention", "group_norm", "layer_norm"]
