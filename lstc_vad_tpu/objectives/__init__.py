from .losses import (  # noqa: F401
    mil_ranking_loss,
    soft_cross_entropy_on_probs,
    weighted_bce,
    stn_mil_loss,
    ltn_mil_loss,
)
