"""Export a trained Flax checkpoint BACK to the reference's torch format.

The inverse of tools/convert_reference_tokenizer.py: a tokenizer / AR-prior
checkpoint trained in this framework becomes a `.pth` the reference loads
with its own `from_checkpoint` (`/root/reference/models/larp_tokenizer.py:376-398`,
`larp_ar.py` equivalent: a dict `{"model": {"name", "args", "sd"}}`) — so
models trained here remain usable by the upstream ecosystem.

Fixed (non-learned) sin-cos PE buffers are persistent buffers in the
reference state dict (`larp_tokenizer.py:128-173`); they are regenerated
from the BOUND Flax module's own tables (the exact arrays our forward uses,
parity-tested against the reference's generators in tests/test_ops.py).

Round-trip (export -> convert_reference_tokenizer -> leaf-exact tree) is
pinned in tests/test_model_io.py.

Usage:
  python tools/export_reference_tokenizer.py tokenizer <ckpt_dir> <out.pth> [version]
  python tools/export_reference_tokenizer.py ar        <ckpt_dir> <out.pth> [version]
"""
from __future__ import annotations

import sys
from pathlib import Path
from typing import Any, Dict

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def _np(x):
    return np.asarray(x, np.float32)


def export_linear(sd: Dict[str, np.ndarray], prefix: str, tree: Dict[str, Any],
                  transpose: bool = True) -> None:
    k = _np(tree["kernel"])
    sd[f"{prefix}.weight"] = k.T if transpose else k
    if "bias" in tree:
        sd[f"{prefix}.bias"] = _np(tree["bias"])


def export_layernorm(sd, prefix, tree) -> None:
    if "scale" in tree:
        sd[f"{prefix}.weight"] = _np(tree["scale"])
    if "bias" in tree:
        sd[f"{prefix}.bias"] = _np(tree["bias"])


def export_timm_block(sd, prefix, tree) -> None:
    export_layernorm(sd, f"{prefix}.norm1", tree["norm1"])
    export_linear(sd, f"{prefix}.attn.qkv", tree["attn"]["qkv"])
    export_linear(sd, f"{prefix}.attn.proj", tree["attn"]["proj"])
    export_layernorm(sd, f"{prefix}.norm2", tree["norm2"])
    export_linear(sd, f"{prefix}.mlp.fc1", tree["mlp"]["fc1"])
    export_linear(sd, f"{prefix}.mlp.fc2", tree["mlp"]["fc2"])


def export_vit_stack(sd, prefix, tree) -> None:
    i = 0
    while f"blocks_{i}" in tree:
        export_timm_block(sd, f"{prefix}.blocks.{i}", tree[f"blocks_{i}"])
        i += 1


def export_patch_embed(sd, prefix, tree, model) -> None:
    """Dense patchify kernel back to the reference Conv3d/Conv2d weight."""
    k = _np(tree["kernel"])  # [(pt p p c) | (p p c), D]
    d = k.shape[1]
    p, c = model.patch_size, model.in_channels
    pt = model.temporal_patch_size
    if k.shape[0] == pt * p * p * c:
        w = k.reshape(pt, p, p, c, d).transpose(4, 3, 0, 1, 2)
    elif k.shape[0] == p * p * c:
        w = k.reshape(p, p, c, d).transpose(3, 2, 0, 1)
    else:
        raise ValueError(f"patchify kernel rows {k.shape[0]} match neither "
                         f"3D ({pt}x{p}x{p}x{c}) nor 2D ({p}x{p}x{c})")
    sd[f"{prefix}.weight"] = w
    if "bias" in tree:
        sd[f"{prefix}.bias"] = _np(tree["bias"])


def export_larp_tokenizer(model, params) -> Dict[str, np.ndarray]:
    bound = model.bind({"params": params})
    sd: Dict[str, np.ndarray] = {}
    export_patch_embed(sd, "x_embedder.proj", params["x_embedder"]["proj"],
                       model)
    export_vit_stack(sd, "encoder", params["encoder"])
    export_vit_stack(sd, "decoder", params["decoder"])

    # PEs: learned -> from params (with the reference's `encode_w_embed`
    # spelling); fixed -> the bound module's own sin-cos tables, which are
    # persistent buffers in the reference state dict
    if model.learned_encoder_patch_pe:
        for ours, ref in (("encoder_h_embed", "encoder_h_embed"),
                          ("encoder_w_embed", "encode_w_embed"),
                          ("encoder_t_embed", "encoder_t_embed")):
            sd[ref] = _np(params[ours])
    else:
        d = model.encoder_hidden_size
        sd["encoder_patch_pe"] = _np(bound.encoder_patch_pe).reshape(1, -1, d)
    if model.learned_encoder_latent_query_embed:
        q = _np(params["encoder_latent_query_embed"])
    else:
        q = _np(bound.encoder_latent_query_embed)
    sd["encoder_latent_query_embed"] = q.reshape(
        model.bottleneck_token_num, model.encoder_hidden_size
    )
    dd = model.decoder_hidden_size
    if model.learned_decoder_latent_pe:
        sd["decoder_latent_pe"] = _np(params["decoder_latent_pe"]).reshape(
            1, -1, dd)
    else:
        sd["decoder_latent_pe"] = _np(bound.decoder_latent_pe).reshape(
            1, -1, dd)
    if model.learned_decoder_patch_query_embed:
        for name in ("decoder_h_embed", "decoder_w_embed", "decoder_t_embed"):
            sd[name] = _np(params[name])
    else:
        sd["decoder_patch_query_embed"] = _np(
            bound.decoder_patch_query_embed).reshape(1, -1, dd)
    for name in (
        "encoder_patch_token_type_embed",
        "encoder_latent_query_token_type_embed",
        "decoder_latent_token_type_embed",
        "decoder_patch_query_token_type_embed",
    ):
        if name in params:
            sd[name] = _np(params[name])

    if "bottleneck_module" in params:
        bt = params["bottleneck_module"]
        export_linear(sd, "bottleneck.in_linear", bt["in_linear"])
        export_linear(sd, "bottleneck.out_linear", bt["out_linear"])
        sd["bottleneck.regularizer.embedding.weight"] = _np(
            bt["reg"]["embedding"])
        if "stochastic_temperature_inv" in bt["reg"]:
            sd["bottleneck.regularizer.stochastic_temperature_inv"] = _np(
                bt["reg"]["stochastic_temperature_inv"])
    if "fsq_in_linear" in params:
        export_layernorm(sd, "fsq_norm", params["fsq_norm"])
        export_linear(sd, "fsq_in_linear", params["fsq_in_linear"])
        export_linear(sd, "fsq_out_linear", params["fsq_out_linear"])
    if "sq_in_linear" in params:
        export_linear(sd, "sq_in_linear", params["sq_in_linear"])
        export_linear(sd, "sq_out_linear", params["sq_out_linear"])
        sd["bottleneck.embedding.weight"] = _np(
            params["sq_quantizer"]["embedding"])

    export_layernorm(sd, "final_layer.norm_final",
                     params["final_layer"]["norm_final"])
    export_linear(sd, "final_layer.linear", params["final_layer"]["linear"])
    return sd


def export_larp_ar(model, params) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {
        "tok_embeddings.weight": _np(params["tok_embeddings"]["embedding"]),
        "norm.weight": _np(params["norm"]["scale"]),
    }
    export_linear(sd, "output", params["output"])
    if "abs_pe" in params:
        sd["abs_pe"] = _np(params["abs_pe"])
    else:  # use_fixed_pe: a persistent buffer in the reference
        sd["abs_pe"] = _np(model.bind({"params": params}).abs_pe)
    if "cls_embedding" in params:
        # our table always carries the trailing null (CFG) row; the
        # reference sizes it num_classes + int(class_dropout_prob > 0) —
        # exported checkpoints target dropout > 0 models (the shipped cfgs),
        # where the shapes agree
        sd["cls_embedding.embedding_table.weight"] = _np(
            params["cls_embedding"]["embedding_table"]["embedding"])
    i = 0
    while f"layers_{i}" in params:
        t, p = params[f"layers_{i}"], f"layers.{i}"
        export_linear(sd, f"{p}.attention.wqkv", t["attention"]["wqkv"])
        export_linear(sd, f"{p}.attention.wo", t["attention"]["wo"])
        for w in ("w1", "w2", "w3"):
            export_linear(sd, f"{p}.feed_forward.{w}", t["feed_forward"][w])
        sd[f"{p}.attention_norm.weight"] = _np(t["attention_norm"]["scale"])
        sd[f"{p}.ffn_norm.weight"] = _np(t["ffn_norm"]["scale"])
        i += 1
    return sd


def main():
    kind, ckpt_dir, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    version = sys.argv[4] if len(sys.argv) > 4 else "sd"

    import video_tokenizer_tpu.models  # noqa: F401 (register)
    from video_tokenizer_tpu.utils.model_io import load_model_from_checkpoint
    from video_tokenizer_tpu.utils import checkpoint as ckpt_lib

    model, params = load_model_from_checkpoint(ckpt_dir, version)
    if kind == "tokenizer":
        sd = export_larp_tokenizer(model, params)
    elif kind == "ar":
        sd = export_larp_ar(model, params)
    else:
        raise ValueError(kind)

    import torch

    meta = ckpt_lib.load_meta(ckpt_dir)
    spec = meta.get("model", {})
    torch.save(
        {"model": {"name": spec.get("name", kind),
                   "args": spec.get("args", {}),
                   "sd": {k: torch.from_numpy(np.ascontiguousarray(v))
                          for k, v in sd.items()}}},
        out_path,
    )
    print(f"wrote {out_path} ({len(sd)} tensors)")


if __name__ == "__main__":
    main()
