"""flash_attn_func on top of torch SDPA (CPU).

flash_attn layout: q, k, v [B, S, H, D] -> out [B, S, H, D]."""
import torch.nn.functional as F


def flash_attn_func(q, k, v, dropout_p=0.0, softmax_scale=None,
                    causal=False, **kwargs):
    qt, kt, vt = (t.transpose(1, 2) for t in (q, k, v))  # [B, H, S, D]
    out = F.scaled_dot_product_attention(
        qt, kt, vt, dropout_p=dropout_p, is_causal=causal,
        scale=softmax_scale,
    )
    return out.transpose(1, 2)


def flash_attn_qkvpacked_func(qkv, *a, **k):
    q, kk, v = qkv.unbind(dim=2)
    return flash_attn_func(q, kk, v, *a, **k)


def flash_attn_varlen_func(q, k, v, cu_seqlens_q, cu_seqlens_k,
                           max_seqlen_q, max_seqlen_k, dropout_p=0.0,
                           softmax_scale=None, causal=False, **kwargs):
    """Packed variable-length attention: run each [start, end) segment
    independently (q/k/v are [total_tokens, H, D])."""
    import torch

    outs = []
    for i in range(cu_seqlens_q.numel() - 1):
        qs, qe = int(cu_seqlens_q[i]), int(cu_seqlens_q[i + 1])
        ks, ke = int(cu_seqlens_k[i]), int(cu_seqlens_k[i + 1])
        o = flash_attn_func(
            q[qs:qe][None], k[ks:ke][None], v[ks:ke][None],
            dropout_p=dropout_p, softmax_scale=softmax_scale, causal=causal,
        )[0]
        outs.append(o)
    return torch.cat(outs, dim=0)
