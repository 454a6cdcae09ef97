from .warping import LossConfig, event_warping_loss  # noqa: F401
from .metrics import aee, fwl, rsat  # noqa: F401
