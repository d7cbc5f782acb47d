from .attention import attention, xla_attention
from .vq import vq_lookup
from . import sincos

__all__ = ["attention", "xla_attention", "vq_lookup", "sincos"]
