"""decord stub: import-time only (the fake `null` dataset never decodes)."""


class VideoReader:
    def __init__(self, *a, **k):
        raise RuntimeError(
            "decord stub: real video decoding is unavailable in the parity "
            "harness (use the fake null dataset)"
        )


class cpu:  # noqa: N801 (decord exposes lowercase ctx factories)
    def __init__(self, *a, **k):
        pass


class gpu(cpu):  # noqa: N801
    pass


class bridge:
    @staticmethod
    def set_bridge(*a, **k):
        pass
