"""torchvision shim for the reference A/B harness (see models/)."""

from . import models  # noqa: F401
