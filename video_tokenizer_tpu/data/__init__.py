from ..registry import datasets
from .video_dataset import VideoDataset, VideoTransform  # noqa: F401
from .loader import make_loader, epoch_loader  # noqa: F401
