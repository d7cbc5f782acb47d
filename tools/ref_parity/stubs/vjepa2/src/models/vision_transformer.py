"""Any `vit_*` factory resolves to a raiser: the VJEPA2 teacher cannot be
constructed offline, and the parity harness never instantiates it."""


def __getattr__(name):
    def _unavailable(*a, **k):
        raise RuntimeError(
            f"vjepa2 stub: {name} cannot be constructed offline"
        )

    return _unavailable
