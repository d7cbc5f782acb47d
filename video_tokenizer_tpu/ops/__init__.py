from .attention import attention, attention_with_lse, xla_attention
from .vq import vq_lookup
from . import rope
from . import sincos

__all__ = [
    "attention", "attention_with_lse", "xla_attention", "vq_lookup",
    "rope", "sincos",
]
