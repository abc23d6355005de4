"""Model assembly + losses (ref: dpc/models/)."""

from dpcx.models.model_pc import ModelPointCloud
from dpcx.models.losses import compute_loss

__all__ = ["ModelPointCloud", "compute_loss"]
