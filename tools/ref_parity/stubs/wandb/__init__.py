"""No-op wandb API surface (offline parity harness)."""


class _Summary(dict):
    pass


class _Run:
    id = "offline"
    _step = 0
    summary = _Summary()

    def log_code(self, *a, **k):
        pass


run = _Run()


class Settings:
    def __init__(self, *a, **k):
        pass


def init(*a, **k):
    return run


def log(*a, **k):
    pass


def finish(*a, **k):
    pass


def login(*a, **k):
    return True


def watch(*a, **k):
    pass
