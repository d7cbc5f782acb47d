from . import video_utils  # noqa: F401
