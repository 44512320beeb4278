from .end2end import PointUnetPipeline

__all__ = ["PointUnetPipeline"]
