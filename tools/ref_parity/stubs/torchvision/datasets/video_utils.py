class VideoClips:
    def __init__(self, *a, **k):
        raise RuntimeError(
            "torchvision stub: VideoClips is unavailable in the parity "
            "harness"
        )
