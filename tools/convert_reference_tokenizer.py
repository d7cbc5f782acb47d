"""Convert reference LARP tokenizer / AR checkpoints to this framework.

Maps the torch state dict of `/root/reference/models/larp_tokenizer.py` (also
the public hywang66/LARP-L-long-tokenizer HF weights) and `models/larp_ar.py`
onto our Flax parameter trees, enabling the golden-number parity runs
(eval/eval_larp_tokenizer.py docstring).

Usage:
  python tools/convert_reference_tokenizer.py tokenizer <ckpt.pth|model.safetensors> out.npz
  python tools/convert_reference_tokenizer.py ar        <ckpt.pth> out.npz

The mapping is validated by tests/test_weight_conversion.py against
numerically-identical torch reimplementations of each layer type.
"""
from __future__ import annotations

import sys
from typing import Any, Dict

import numpy as np


def _t(x):
    return np.asarray(x)


def convert_linear(sd, prefix, transpose=True) -> Dict[str, Any]:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T if transpose else _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def convert_layernorm(sd, prefix) -> Dict[str, Any]:
    out = {}
    if f"{prefix}.weight" in sd:
        out["scale"] = _t(sd[f"{prefix}.weight"])
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def convert_timm_block(sd, prefix) -> Dict[str, Any]:
    """timm `Block` -> our ViTBlock tree (norm1/attn{qkv,proj}/norm2/mlp)."""
    return {
        "norm1": convert_layernorm(sd, f"{prefix}.norm1"),
        "attn": {
            "qkv": convert_linear(sd, f"{prefix}.attn.qkv"),
            "proj": convert_linear(sd, f"{prefix}.attn.proj"),
        },
        "norm2": convert_layernorm(sd, f"{prefix}.norm2"),
        "mlp": {
            "fc1": convert_linear(sd, f"{prefix}.mlp.fc1"),
            "fc2": convert_linear(sd, f"{prefix}.mlp.fc2"),
        },
    }


def convert_patch_embed3d(sd, prefix) -> Dict[str, Any]:
    """Conv3d k=s patchify [D, C, pt, p, p] -> Dense kernel [(pt p p c), D].

    Our PatchEmbed3D flattens tubelets as (pt, p1, p2, c) — see
    video_tokenizer_tpu/models/embed.py rearrange pattern."""
    w = _t(sd[f"{prefix}.weight"])  # [D, C, PT, P1, P2]
    k = np.transpose(w, (2, 3, 4, 1, 0)).reshape(-1, w.shape[0])
    out = {"kernel": k}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def convert_video_patch_embed(sd, prefix) -> Dict[str, Any]:
    """timm PatchEmbed Conv2d [D, C, p, p] -> Dense kernel [(p p c), D]."""
    w = _t(sd[f"{prefix}.weight"])
    k = np.transpose(w, (2, 3, 1, 0)).reshape(-1, w.shape[0])
    out = {"kernel": k}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def convert_vit_stack(sd, prefix, depth) -> Dict[str, Any]:
    return {
        f"blocks_{i}": convert_timm_block(sd, f"{prefix}.blocks.{i}")
        for i in range(depth)
    }


def convert_larp_tokenizer(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference LARPTokenizer state dict -> our Flax params tree.

    Fixed sin-cos PE buffers (encoder_patch_pe, decoder_latent_pe,
    decoder_patch_query_embed) are regenerated identically at init and are
    NOT parameters here — they're skipped (verified equal by our sincos
    tests)."""
    depth_enc = max(
        int(k.split(".")[2]) for k in sd if k.startswith("encoder.blocks.")
    ) + 1
    depth_dec = max(
        int(k.split(".")[2]) for k in sd if k.startswith("decoder.blocks.")
    ) + 1

    params: Dict[str, Any] = {}
    if "x_embedder.proj.weight" in sd:
        w = _t(sd["x_embedder.proj.weight"])
        if w.ndim == 5:
            params["x_embedder"] = {"proj": convert_patch_embed3d(sd, "x_embedder.proj")}
        else:
            params["x_embedder"] = {"proj": convert_video_patch_embed(sd, "x_embedder.proj")}

    params["encoder"] = convert_vit_stack(sd, "encoder", depth_enc)
    params["decoder"] = convert_vit_stack(sd, "decoder", depth_dec)

    if "encoder_latent_query_embed" in sd:
        params["encoder_latent_query_embed"] = _t(sd["encoder_latent_query_embed"])
    for name in (
        "encoder_patch_token_type_embed",
        "encoder_latent_query_token_type_embed",
        "decoder_latent_token_type_embed",
        "decoder_patch_query_token_type_embed",
    ):
        if name in sd:
            params[name] = _t(sd[name])
    for name in (
        "encoder_h_embed", "encode_w_embed", "encoder_t_embed",
        "decoder_h_embed", "decoder_w_embed", "decoder_t_embed",
    ):
        if name in sd:
            ours = {"encode_w_embed": "encoder_w_embed"}.get(name, name)
            params[ours] = _t(sd[name])

    # bottleneck
    if "bottleneck.in_linear.weight" in sd:
        params["bottleneck_module"] = {
            "in_linear": convert_linear(sd, "bottleneck.in_linear"),
            "out_linear": convert_linear(sd, "bottleneck.out_linear"),
            "reg": {"embedding": _t(sd["bottleneck.regularizer.embedding.weight"])},
        }
        if "bottleneck.regularizer.stochastic_temperature_inv" in sd:
            params["bottleneck_module"]["reg"]["stochastic_temperature_inv"] = _t(
                sd["bottleneck.regularizer.stochastic_temperature_inv"]
            )
    if "fsq_in_linear.weight" in sd:
        params["fsq_norm"] = convert_layernorm(sd, "fsq_norm")
        params["fsq_in_linear"] = convert_linear(sd, "fsq_in_linear")
        params["fsq_out_linear"] = convert_linear(sd, "fsq_out_linear")
    if "sq_in_linear.weight" in sd:
        params["sq_in_linear"] = convert_linear(sd, "sq_in_linear")
        params["sq_out_linear"] = convert_linear(sd, "sq_out_linear")
        params["sq_quantizer"] = {"embedding": _t(sd["bottleneck.embedding.weight"])}

    params["final_layer"] = {
        "norm_final": convert_layernorm(sd, "final_layer.norm_final"),
        "linear": convert_linear(sd, "final_layer.linear"),
    }
    return params


def convert_lpips_disc_loss(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference VQLPIPSWithDiscriminator state dict -> our loss module's
    variables {"params": {"discriminator": ...}, "ema": {...}}.

    Maps the TransformerDiscriminator (reference models/loss.py:119-204:
    patch embed, cls token, fused ViT `transformer_encoder.blocks.{i}`,
    norm_final, fc head) and the LeCam EMA buffers (loss.py:302-303). The
    LPIPS (`perceptual_loss.*`) tower is NOT mapped — its torch weights are
    the external VGG checkpoint, gated offline; callers run with
    perceptual_weight 0 (tools/reference_parity.py GAN phases) or graft the
    converted LPIPS separately (tools/convert_lpips.py).
    """
    pfx = "discriminator."
    depth = max(
        int(k.split(".")[3]) for k in sd
        if k.startswith(pfx + "transformer_encoder.blocks.")
    ) + 1
    w = _t(sd[pfx + "x_embedder.proj.weight"])
    if w.ndim == 5:
        x_emb = {"proj": convert_patch_embed3d(sd, pfx + "x_embedder.proj")}
    else:
        x_emb = {"proj": convert_video_patch_embed(sd, pfx + "x_embedder.proj")}
    disc = {
        "x_embedder": x_emb,
        "cls_token": _t(sd[pfx + "cls_token"]),
        "transformer_encoder": convert_vit_stack(
            sd, pfx + "transformer_encoder", depth
        ),
        "norm_final": convert_layernorm(sd, pfx + "norm_final"),
        "fc": convert_linear(sd, pfx + "fc"),
    }
    variables: Dict[str, Any] = {"params": {"discriminator": disc}}
    if "lecam_ema_real" in sd:
        variables["ema"] = {
            "lecam_ema_real": _t(sd["lecam_ema_real"]),
            "lecam_ema_fake": _t(sd["lecam_ema_fake"]),
        }
    return variables


def convert_larp_ar(
    sd: Dict[str, np.ndarray], num_classes: int | None = None
) -> Dict[str, Any]:
    """Reference LARP_AR state dict -> our Flax params tree.

    `num_classes`: if given and the reference class-embedding table has
    exactly that many rows (model built with class_dropout_prob == 0,
    larp_ar.py:246-257 sizes it num_classes + int(dropout > 0)), a zero null
    row is appended — our LabelEmbedder always allocates the null row so CFG
    sampling / force-drop stay in range regardless of dropout_prob.
    """
    n_layer = max(
        int(k.split(".")[1]) for k in sd if k.startswith("layers.")
    ) + 1
    params: Dict[str, Any] = {
        "tok_embeddings": {"embedding": _t(sd["tok_embeddings.weight"])},
        "norm": {"scale": _t(sd["norm.weight"])},
        "output": convert_linear(sd, "output"),
    }
    if "abs_pe" in sd:
        params["abs_pe"] = _t(sd["abs_pe"])
    if "cls_embedding.embedding_table.weight" in sd:
        table = _t(sd["cls_embedding.embedding_table.weight"])
        if num_classes is not None and table.shape[0] == num_classes:
            table = np.concatenate(
                [table, np.zeros((1, table.shape[1]), table.dtype)], axis=0
            )
        params["cls_embedding"] = {
            "embedding_table": {"embedding": table}
        }
    for i in range(n_layer):
        p = f"layers.{i}"
        params[f"layers_{i}"] = {
            "attention": {
                "wqkv": convert_linear(sd, f"{p}.attention.wqkv"),
                "wo": convert_linear(sd, f"{p}.attention.wo"),
            },
            "feed_forward": {
                "w1": convert_linear(sd, f"{p}.feed_forward.w1"),
                "w2": convert_linear(sd, f"{p}.feed_forward.w2"),
                "w3": convert_linear(sd, f"{p}.feed_forward.w3"),
            },
            "attention_norm": {"scale": _t(sd[f"{p}.attention_norm.weight"])},
            "ffn_norm": {"scale": _t(sd[f"{p}.ffn_norm.weight"])},
        }
    return params


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt and "sd" in ckpt["model"]:
        sd = ckpt["model"]["sd"]
    elif isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
    else:
        sd = ckpt
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def main():
    kind, in_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    sd = load_state_dict(in_path)
    if kind == "tokenizer":
        params = convert_larp_tokenizer(sd)
    elif kind == "ar":
        # optional 4th arg: num_classes, to pad the null class row when the
        # source model was built with class_dropout_prob == 0
        nc = int(sys.argv[4]) if len(sys.argv) > 4 else None
        params = convert_larp_ar(sd, num_classes=nc)
    else:
        raise ValueError(kind)
    np.savez(out_path, params=np.asarray({"params": params}, dtype=object))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
