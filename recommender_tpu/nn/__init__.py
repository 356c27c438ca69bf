from recommender_tpu.nn.mlp import MLP
from recommender_tpu.nn.interactions import DotInteraction, fm_cross
from recommender_tpu.nn.losses import (
    binary_cross_entropy,
    bce_with_logits,
    sampled_sigmoid_ce,
    margin_loss,
)
from recommender_tpu.nn.schedules import dlrm_warmup_cosine

__all__ = [
    "MLP",
    "DotInteraction",
    "fm_cross",
    "binary_cross_entropy",
    "bce_with_logits",
    "sampled_sigmoid_ce",
    "margin_loss",
    "dlrm_warmup_cosine",
]
