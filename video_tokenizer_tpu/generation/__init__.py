from .generate import generate, top_k_top_p_filtering, sample_from_logits
from .speculative import self_draft, speculative_generate

__all__ = [
    "generate",
    "top_k_top_p_filtering",
    "sample_from_logits",
    "self_draft",
    "speculative_generate",
]
