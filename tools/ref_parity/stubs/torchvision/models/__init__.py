"""torchvision.models stub: only what utils/fid/inception.py subclasses at
import time. FID is never computed in the parity harness."""
from . import inception  # noqa: F401
from .inception import inception_v3  # noqa: F401
