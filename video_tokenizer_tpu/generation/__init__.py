from .generate import generate, top_k_top_p_filtering, sample_from_logits
from .speculative import speculative_generate

__all__ = [
    "generate",
    "top_k_top_p_filtering",
    "sample_from_logits",
    "speculative_generate",
]
