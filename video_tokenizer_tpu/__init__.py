"""video_tokenizer_tpu — TPU-native video tokenization + AR generation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
zhxie0117/video-tokenizer (a LARP-style PyTorch codebase): video tokenizers
(ViT + holistic query tokens + VQ/FSQ bottlenecks), llama-style AR priors with
compiled KV-cache sampling, GAN+LPIPS tokenizer training, and FVD/FID eval —
all as single-program SPMD over a jax.sharding.Mesh.
"""
__version__ = "0.1.0"

from .registry import models, datasets, trainers
from .config import ConfigDict, load_config

__all__ = ["models", "datasets", "trainers", "ConfigDict", "load_config"]
