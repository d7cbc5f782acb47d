import torch.nn as nn


class _Base(nn.Module):
    def __init__(self, *a, **k):
        super().__init__()

    def forward(self, *a, **k):
        raise RuntimeError(
            "torchvision stub: Inception blocks are unavailable offline"
        )


class InceptionA(_Base):
    pass


class InceptionB(_Base):
    pass


class InceptionC(_Base):
    pass


class InceptionD(_Base):
    pass


class InceptionE(_Base):
    pass


class InceptionAux(_Base):
    pass


def inception_v3(*a, **k):
    raise RuntimeError(
        "torchvision stub: inception_v3 weights are unavailable offline"
    )
