"""Multi-axis rotary position embeddings (M-RoPE) for mixed 1D + THW tokens.

Re-expresses `/root/reference/models/model_new/base/rope.py` (which follows
Lumina2/LTX diffusers conventions):
  * frequency ladder: freqs[j] = theta**(j/(d/2-1)) * pi/2 (rope.py:28-48) —
    note this is the reference's *ascending* ladder, kept for parity.
  * position grid (rope.py:53-83): the first `in_tokens` sequence positions
    get a shared 1D index written into ALL axes; the THW patch tokens get
    (t, h, w) offsets shifted by `in_tokens` so 1D and 3D share one rotary
    space.
  * per-axis tables interleaved THWTHW...THTH...TT into the head dim
    (rope.py:86-103); multi-segment `get_freqs_multi` for first-frame
    conditioned decoders (rope.py:119-143).

TPU-first: tables are precomputed host-side in fp64 and stored as (cos, sin)
real pairs [L, head_dim/2]; `apply_rotary` is a fused elementwise pair
rotation ((even,odd) adjacent pairs — matching torch.view_as_complex layout)
that XLA folds into the surrounding matmuls.
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rotary_angles_1d(dim: int, pos: np.ndarray, theta: float = 10000.0) -> np.ndarray:
    """Angles [L, dim/2] with the reference's ascending frequency ladder."""
    assert dim % 2 == 0
    n = dim // 2
    exponents = np.linspace(0.0, 1.0, n, dtype=np.float64)
    freqs = (theta**exponents) * (math.pi / 2.0)
    return np.asarray(pos, np.float64)[:, None] * freqs[None, :]


def mrope_grid(in_grid: Sequence[int], in_tokens: int) -> np.ndarray:
    """[L, 3] position ids: 1D ids for latent tokens, offset THW for patches."""
    frames, height, width = in_grid
    seq_len = int(np.prod(in_grid)) + in_tokens
    ids = np.zeros((seq_len, len(in_grid)), dtype=np.int64)
    ids[:in_tokens] = np.arange(in_tokens)[:, None]
    t = np.arange(frames).reshape(-1, 1, 1)
    h = np.arange(height).reshape(1, -1, 1)
    w = np.arange(width).reshape(1, 1, -1)
    ids[in_tokens:, 0] = np.broadcast_to(t, in_grid).reshape(-1)
    ids[in_tokens:, 1] = np.broadcast_to(h, in_grid).reshape(-1)
    ids[in_tokens:, 2] = np.broadcast_to(w, in_grid).reshape(-1)
    ids[in_tokens:] += in_tokens
    return ids


def interleave_angle_tables(tables: List[np.ndarray]) -> np.ndarray:
    """Interleave per-axis angle tables THWTHW...THTH...TT (rope.py:86-103)."""
    dim = sum(t.shape[-1] for t in tables)
    out = np.zeros((*tables[0].shape[:-1], dim), dtype=tables[0].dtype)
    tables = sorted(tables, key=lambda t: t.shape[-1], reverse=True)
    offset = 0
    last_len = 0
    while tables:
        indices = np.arange(tables[-1].shape[-1] - offset)
        k = len(tables)
        for i, t in enumerate(tables):
            out[..., indices * k + i + last_len] = t[..., indices + offset]
        offset += indices.shape[0]
        last_len += indices.shape[0] * k
        tables.pop(-1)
    return out


def _axes_dims(head_dim: int, n_axes: int) -> List[int]:
    per = head_dim / n_axes
    dims = [int(per - (per % 2))] * n_axes
    dims[0] += head_dim - sum(dims)
    return dims


def mrope_cos_sin(
    in_tokens: int, in_grid: Sequence[int], head_dim: int,
    theta: float = 10000.0, interleave: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (cos, sin) float32 tables [L, head_dim/2].

    interleave=True uses the model_new THWTHW... layout (rope.py:86-103);
    interleave=False concatenates per-axis tables (Lumina2/TiTok layout,
    model_titok/base/rope.py:81-89).
    """
    dims = _axes_dims(head_dim, len(in_grid))
    grid = mrope_grid(in_grid, in_tokens)
    tables = [
        rotary_angles_1d(dims[i], grid[:, i], theta) for i in range(len(dims))
    ]
    if interleave:
        angles = interleave_angle_tables(tables)
    else:
        angles = np.concatenate(tables, axis=-1)
    return np.cos(angles).astype(np.float32), np.sin(angles).astype(np.float32)


def mrope_cos_sin_multi(
    in_seqs: Sequence[Tuple[int, Sequence[int]]],
    head_dim: int,
    theta: float = 10000.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Multi-segment variant (rope.py:119-143): each (in_tokens, grid) segment
    continues the position numbering of the previous one. Returns one
    concatenated (cos, sin) pair covering all segments in order.

    Parity quirk (kept, verified identical to the reference): the offset is
    grids[i-1].max() WITHOUT +1 — the reference's own '+ 1 extra?' comment
    flags the doubt — so segment i's first position coincides with segment
    i-1's last, making those two tokens rotationally indistinguishable."""
    n_axes = len(in_seqs[0][1])
    dims = _axes_dims(head_dim, n_axes)
    grids = []
    for i, (toks, grid) in enumerate(in_seqs):
        g = mrope_grid(grid, toks)
        if i > 0:
            g = g + grids[i - 1].max()
        grids.append(g)
    grid = np.concatenate(grids, axis=0)
    tables = [rotary_angles_1d(dims[i], grid[:, i], theta) for i in range(n_axes)]
    angles = interleave_angle_tables(tables)
    return np.cos(angles).astype(np.float32), np.sin(angles).astype(np.float32)


def apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, L, H, D]; cos/sin: [L, D/2]. Adjacent-pair complex rotation."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    x_even = xf[..., 0::2]
    x_odd = xf[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out_even = x_even * c - x_odd * s
    out_odd = x_even * s + x_odd * c
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)
    return out.astype(orig_dtype)
