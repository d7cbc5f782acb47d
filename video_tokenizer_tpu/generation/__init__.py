from .generate import generate, top_k_top_p_filtering, sample_from_logits

__all__ = ["generate", "top_k_top_p_filtering", "sample_from_logits"]
