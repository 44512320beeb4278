from .randlanet import RandLANet, init_randlanet
from .losses import (
    generalised_dice_loss,
    point_dice_loss,
    saliency_dice_loss,
    soft_dice,
    weighted_cross_entropy,
)

__all__ = [
    "RandLANet",
    "init_randlanet",
    "generalised_dice_loss",
    "point_dice_loss",
    "saliency_dice_loss",
    "soft_dice",
    "weighted_cross_entropy",
]
