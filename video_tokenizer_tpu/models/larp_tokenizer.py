"""LARP tokenizer: holistic query-token ViT video tokenizer (Flax).

Re-expresses `/root/reference/models/larp_tokenizer.py` TPU-first:
  * 3D patch embed (fused matmul) + fixed 3D sin-cos PE (larp_tokenizer.py:407)
  * encoder: full self-attention over [patches ‖ learned query tokens], keep
    the last `bottleneck_token_num` outputs (models/transformer.py:62-70)
  * bottleneck: 'vq' (Bottleneck+SimpleVectorQuantizer), 'fsq'
    (LN + Linear d->6 + FSQ[8,8,8,5,5,5] + Linear 6->d,
    larp_tokenizer.py:219-229), or 'sq' (Linear d->24 + Leech-lattice
    quantizer + Linear 24->d, larp_tokenizer.py:230-233)
  * decoder: latents + 1D sin-cos PE attend together with 3D-PE pixel queries
    (larp_tokenizer.py:456-469); OutputLayer (LN + zero-init Linear,
    larp_tokenizer.py:31-41,326-328); einops unpatchify to BCTHW
    (larp_tokenizer.py:441-454)
  * `encode_eval` / `decode_eval` support fewer frames via PE truncation
    (larp_tokenizer.py:430-439,471-482); `decode_from_bottleneck(indices)`
    (larp_tokenizer.py:484-487).

All attention runs through the Pallas flash kernel; VQ/FSQ math is fp32
inside the (optionally bf16) program.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import einops
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import sincos
from ..registry import models
from .bottleneck import Bottleneck
from .embed import PatchEmbed3D, VideoPatchEmbed
from .fsq import FSQ, LatticeVectorQuantizer
from .transformer import ViTStack


class OutputLayer(nn.Module):
    """Final LN + zero-init Linear to patch pixels."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm_final")(x)
        return nn.Dense(
            self.out_dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="linear",
        )(x)


@models.register("larp_tokenizer")
class LARPTokenizer(nn.Module):
    """Flagship video tokenizer. Video tensors are BCTHW in [0, 1]."""

    @classmethod
    def from_pretrained(cls, name_or_path: str, version: str = "sd"):
        """Hub id or local checkpoint -> (module, params). Mirrors the
        reference's PyTorchModelHubMixin.from_pretrained
        (larp_tokenizer.py:45) via the local converted-checkpoint cache
        (utils/model_io.py)."""
        from ..utils.model_io import load_model_pretrained

        return load_model_pretrained(name_or_path, version)

    from_checkpoint = from_pretrained

    bottleneck: Optional[Dict[str, Any]] = None
    prior_model: Optional[Dict[str, Any]] = None
    bottleneck_token_num: int = 1024
    input_size: int = 128
    frame_num: int = 16
    temporal_patch_size: int = 4
    patch_size: int = 8
    decoder_temporal_patch_size: int = 4
    decoder_patch_size: int = 8
    in_channels: int = 3
    bottleneck_type: str = "vq"
    transformer_name: str = "transformer_encoder_parallel"
    latent_pe_scale_factor: float = 10000.0
    query_init_std: float = 0.02
    encoder_hidden_size: int = 768
    decoder_hidden_size: int = 768
    encoder_num_heads: int = 12
    decoder_num_heads: int = 12
    encoder_depth: int = 12
    decoder_depth: int = 12
    train_type: str = "simple"
    learned_encoder_patch_pe: bool = False
    learned_encoder_latent_query_embed: bool = True
    learned_decoder_latent_pe: bool = False
    learned_decoder_patch_query_embed: bool = False
    use_encoder_patch_token_type_embed: bool = False
    use_encoder_latent_query_token_type_embed: bool = False
    use_decoder_latent_token_type_embed: bool = False
    use_decoder_patch_query_token_type_embed: bool = False
    encoder_query_gaussian_init: bool = True
    fsq_levels: tuple = (8, 8, 8, 5, 5, 5)
    sq_n_embed: int = 196_560
    sq_embed_dim: int = 24
    dtype: jnp.dtype = jnp.float32
    use_pallas: Optional[bool] = None
    remat: bool = False
    vq_eval_deterministic: bool = True
    # 'larp_tokenizer_ablation' variant: LayerNorm on the 6-d FSQ projection
    # AFTER fsq_in_linear instead of on the hidden state before it
    # (reference models/larp_tokenizer_ablation.py:222,407-416)
    fsq_norm_after_proj: bool = False

    @property
    def token_hw(self) -> int:
        return self.input_size // self.patch_size

    @property
    def token_t(self) -> int:
        return self.frame_num // self.temporal_patch_size

    @property
    def video_token_num(self) -> int:
        return self.token_t * self.token_hw * self.token_hw

    @property
    def decoder_token_hw(self) -> int:
        return self.input_size // self.decoder_patch_size

    @property
    def decoder_token_t(self) -> int:
        return self.frame_num // self.decoder_temporal_patch_size

    @property
    def recon_video_token_num(self) -> int:
        return self.decoder_token_t * self.decoder_token_hw**2

    @property
    def codebook_size(self) -> int:
        if self.bottleneck_type == "vq":
            return self.bottleneck["args"]["regularizer"]["args"]["codebook_size"]
        if self.bottleneck_type == "fsq":
            return int(np.prod(self.fsq_levels))
        if self.bottleneck_type == "sq":
            return self.sq_n_embed
        raise ValueError(self.bottleneck_type)

    def setup(self):
        assert self.train_type == "simple", (
            "mrope train_type maps to the model_new RoPE family "
            "(autoencoder_* models); use those instead"
        )
        enc_d, dec_d = self.encoder_hidden_size, self.decoder_hidden_size
        if self.temporal_patch_size == 1:
            self.x_embedder = VideoPatchEmbed(
                patch_size=self.patch_size, embed_dim=enc_d, dtype=self.dtype
            )
        else:
            self.x_embedder = PatchEmbed3D(
                spatial_patch_size=self.patch_size,
                temporal_patch_size=self.temporal_patch_size,
                embed_dim=enc_d,
                dtype=self.dtype,
            )

        # --- encoder patch PE
        if self.learned_encoder_patch_pe:
            hw, t = self.token_hw, self.token_t
            self.encoder_h_embed = self.param(
                "encoder_h_embed",
                lambda k: jnp.asarray(sincos.sincos_1d(enc_d, np.arange(hw))).reshape(1, 1, hw, 1, enc_d),
            )
            self.encoder_w_embed = self.param(
                "encoder_w_embed",
                lambda k: jnp.asarray(sincos.sincos_1d(enc_d, np.arange(hw))).reshape(1, 1, 1, hw, enc_d),
            )
            self.encoder_t_embed = self.param(
                "encoder_t_embed",
                lambda k: jnp.asarray(sincos.sincos_1d(enc_d, np.arange(t))).reshape(1, t, 1, 1, enc_d),
            )
        else:
            self.encoder_patch_pe = jnp.asarray(
                sincos.sincos_3d(enc_d, self.token_hw, self.token_t)
            ).reshape(1, self.video_token_num, enc_d)
        if self.use_encoder_patch_token_type_embed:
            self.encoder_patch_token_type_embed = self.param(
                "encoder_patch_token_type_embed",
                nn.initializers.normal(0.02),
                (1, 1, enc_d),
            )

        # --- encoder latent query
        if self.learned_encoder_latent_query_embed:
            if self.encoder_query_gaussian_init:
                init = nn.initializers.normal(self.query_init_std)
            else:
                init = lambda k, s: jnp.asarray(
                    sincos.sincos_1d(enc_d, np.arange(self.bottleneck_token_num))
                )
            self.encoder_latent_query_embed = self.param(
                "encoder_latent_query_embed", init,
                (self.bottleneck_token_num, enc_d),
            )
        else:
            self.encoder_latent_query_embed = jnp.asarray(
                sincos.sincos_1d(
                    enc_d,
                    np.arange(self.bottleneck_token_num),
                    self.latent_pe_scale_factor,
                )
            )
        if self.use_encoder_latent_query_token_type_embed:
            self.encoder_latent_query_token_type_embed = self.param(
                "encoder_latent_query_token_type_embed",
                nn.initializers.normal(0.02),
                (1, 1, enc_d),
            )

        # --- decoder latent PE
        if self.learned_decoder_latent_pe:
            self.decoder_latent_pe = self.param(
                "decoder_latent_pe",
                nn.initializers.normal(0.02),
                (1, self.bottleneck_token_num, dec_d),
            )
        else:
            self.decoder_latent_pe = jnp.asarray(
                sincos.sincos_1d(
                    dec_d,
                    np.arange(self.bottleneck_token_num),
                    self.latent_pe_scale_factor,
                )
            ).reshape(1, self.bottleneck_token_num, dec_d)
        if self.use_decoder_latent_token_type_embed:
            self.decoder_latent_token_type_embed = self.param(
                "decoder_latent_token_type_embed",
                nn.initializers.normal(0.02),
                (1, 1, dec_d),
            )

        # --- decoder patch query PE
        if self.learned_decoder_patch_query_embed:
            hw, t = self.decoder_token_hw, self.decoder_token_t
            self.decoder_h_embed = self.param(
                "decoder_h_embed",
                lambda k: jnp.asarray(sincos.sincos_1d(dec_d, np.arange(hw))).reshape(1, 1, hw, 1, dec_d),
            )
            self.decoder_w_embed = self.param(
                "decoder_w_embed",
                lambda k: jnp.asarray(sincos.sincos_1d(dec_d, np.arange(hw))).reshape(1, 1, 1, hw, dec_d),
            )
            self.decoder_t_embed = self.param(
                "decoder_t_embed",
                lambda k: jnp.asarray(sincos.sincos_1d(dec_d, np.arange(t))).reshape(1, t, 1, 1, dec_d),
            )
        else:
            self.decoder_patch_query_embed = jnp.asarray(
                sincos.sincos_3d(dec_d, self.decoder_token_hw, self.decoder_token_t)
            ).reshape(1, self.recon_video_token_num, dec_d)
        if self.use_decoder_patch_query_token_type_embed:
            self.decoder_patch_query_token_type_embed = self.param(
                "decoder_patch_query_token_type_embed",
                nn.initializers.normal(0.02),
                (1, 1, dec_d),
            )

        self.encoder = ViTStack(
            enc_d, self.encoder_depth, self.encoder_num_heads,
            dtype=self.dtype, use_pallas=self.use_pallas, remat=self.remat,
            name="encoder",
        )
        self.decoder = ViTStack(
            dec_d, self.decoder_depth, self.decoder_num_heads,
            dtype=self.dtype, use_pallas=self.use_pallas, remat=self.remat,
            name="decoder",
        )

        if self.bottleneck_type == "vq":
            bn = dict(self.bottleneck)
            self.bottleneck_module = Bottleneck(
                bottleneck_dim=bn["args"]["bottleneck_dim"],
                input_dim=enc_d,
                output_dim=dec_d,
                token_nums=self.bottleneck_token_num,
                norm=bn["args"].get("norm"),
                regularizer={
                    **dict(bn["args"]["regularizer"]),
                    "args": {
                        **dict(bn["args"]["regularizer"].get("args", {})),
                        "eval_deterministic": self.vq_eval_deterministic,
                    },
                },
                name="bottleneck_module",
            )
        elif self.bottleneck_type == "fsq":
            self.fsq_norm = nn.LayerNorm(name="fsq_norm")
            self.fsq_in_linear = nn.Dense(
                len(self.fsq_levels),
                kernel_init=nn.initializers.normal(0.02),
                name="fsq_in_linear",
            )
            self.fsq_out_linear = nn.Dense(dec_d, name="fsq_out_linear")
            self.fsq = FSQ(self.fsq_levels)
        elif self.bottleneck_type == "sq":
            self.sq_in_linear = nn.Dense(self.sq_embed_dim, name="sq_in_linear")
            self.sq_out_linear = nn.Dense(dec_d, name="sq_out_linear")
            self.sq = LatticeVectorQuantizer(
                n_embed=self.sq_n_embed,
                embed_dim=self.sq_embed_dim,
                l2_norm=True,
                beta=0.25,
                name="sq_quantizer",
            )
        else:
            raise ValueError(self.bottleneck_type)

        self.final_layer = OutputLayer(
            self.decoder_temporal_patch_size
            * self.decoder_patch_size**2
            * self.in_channels,
            dtype=self.dtype,
            name="final_layer",
        )

        # learned AR prior co-trained on the quantized latents (the original
        # LARP recipe: prior_lr_mult 50, loss_latent_ce_weight 0.06 —
        # scripts/train_larp_tokenizer.sh / cfgs/larp_tokenizer.yaml:176).
        # The committed reference hard-disables it (larp_tokenizer.py:241);
        # we keep it functional behind the prior_model spec.
        prior = self.prior_model or {}
        prior_name = str(prior.get("name", "none") or "none").lower()
        if prior_name.startswith("gptc"):
            if self.bottleneck_type != "vq":
                # loss_latent_ce is only computed in the vq bottleneck
                # branch; a prior with fsq/sq would train dead params
                raise ValueError(
                    "prior_model co-training requires bottleneck_type "
                    f"'vq' (got '{self.bottleneck_type}')"
                )
            prior_args = dict(prior.get("args", {}))
            bdim = self.bottleneck["args"]["bottleneck_dim"]
            no_dropout = bool(prior.get("no_dropout", True))
            # user args pass through (e.g. n_layer/n_embd for the bare
            # 'gptc' name); the tokenizer-derived fields are forced
            gptc_kwargs = dict(prior_args)
            gptc_kwargs.update(
                n_ind=bdim,
                max_seq_len=self.bottleneck_token_num,
                l2_normalized=bool(prior_args.get("l2_normalized", True)),
            )
            if no_dropout:
                gptc_kwargs.update(
                    embd_pdrop=0.0, resid_pdrop=0.0, attn_pdrop=0.0
                )
            self.prior = models.make(
                {"name": prior.get("name"), "args": gptc_kwargs}
            )
        else:
            self.prior = None

    # ------------------------------------------------------------------ PEs

    def get_encoder_patch_pe(self) -> jax.Array:
        if self.learned_encoder_patch_pe:
            pe = (
                self.encoder_h_embed + self.encoder_w_embed + self.encoder_t_embed
            ).reshape(1, self.video_token_num, self.encoder_hidden_size)
        else:
            pe = self.encoder_patch_pe
        if self.use_encoder_patch_token_type_embed:
            pe = pe + self.encoder_patch_token_type_embed
        return pe

    def get_encoder_latent_query_embed(self) -> jax.Array:
        q = self.encoder_latent_query_embed[None]
        if self.use_encoder_latent_query_token_type_embed:
            q = q + self.encoder_latent_query_token_type_embed
        return q

    def get_decoder_latent_pe(self) -> jax.Array:
        pe = self.decoder_latent_pe
        if self.use_decoder_latent_token_type_embed:
            pe = pe + self.decoder_latent_token_type_embed
        return pe

    def get_decoder_patch_query_embed(self) -> jax.Array:
        if self.learned_decoder_patch_query_embed:
            pe = (
                self.decoder_h_embed + self.decoder_w_embed + self.decoder_t_embed
            ).reshape(1, self.recon_video_token_num, self.decoder_hidden_size)
        else:
            pe = self.decoder_patch_query_embed
        if self.use_decoder_patch_query_token_type_embed:
            pe = pe + self.decoder_patch_query_token_type_embed
        return pe

    # ------------------------------------------------------------- encoding

    def _encode_latents(self, x: jax.Array, pe_truncate: bool = False):
        """Patchify + PE + parallel encoder -> latent queries' outputs."""
        tokens = self.x_embedder(x)
        num_x_tokens = tokens.shape[1]
        pe = self.get_encoder_patch_pe()
        if pe_truncate:
            pe = pe[:, :num_x_tokens]
        tokens = tokens + pe.astype(tokens.dtype)
        b = tokens.shape[0]
        q = jnp.broadcast_to(
            self.get_encoder_latent_query_embed().astype(tokens.dtype),
            (b, self.bottleneck_token_num, tokens.shape[-1]),
        )
        h = jnp.concatenate([tokens, q], axis=1)
        h = self.encoder(h)
        return h[:, -self.bottleneck_token_num :, :], num_x_tokens

    def _bottleneck_forward(self, z: jax.Array, train: bool) -> Dict[str, Any]:
        if self.bottleneck_type == "vq":
            out = self.bottleneck_module(z.astype(jnp.float32), train=train)
            encoded = out.pop("output")
            if self.prior is not None and "regularized_z" in out:
                out["loss_latent_ce"] = self.prior.compute_prior_loss(
                    out["regularized_z"], train=train
                )
            return {"encoded": encoded, **out}
        if self.bottleneck_type == "fsq":
            if self.fsq_norm_after_proj:
                z = self.fsq_in_linear(z)
                z = self.fsq_norm(z)
            else:
                z = self.fsq_norm(z)
                z = self.fsq_in_linear(z)
            codes, info = self.fsq(z)
            encoded = self.fsq_out_linear(codes)
            return {
                "encoded": encoded,
                "bottleneck_rep": info["indices"],
                "loss_q": jnp.asarray(0.0),
            }
        if self.bottleneck_type == "sq":
            z = self.sq_in_linear(z)
            out = self.sq(z.astype(jnp.float32), train=train)
            encoded = self.sq_out_linear(out.pop("output"))
            return {"encoded": encoded, "loss_q": out.pop("loss_codebook"), **out}
        raise ValueError(self.bottleneck_type)

    def encode(self, x: jax.Array, train: bool = False) -> Dict[str, Any]:
        z, _ = self._encode_latents(x)
        return self._bottleneck_forward(z, train)

    def encode_eval(self, x: jax.Array) -> Dict[str, Any]:
        """Encode clips with fewer frames than trained (PE truncation)."""
        z, num_x_tokens = self._encode_latents(x, pe_truncate=True)
        out = self._bottleneck_forward(z, train=False)
        out["num_x_tokens"] = num_x_tokens
        return out

    # ------------------------------------------------------------- decoding

    def unpatchify(self, x: jax.Array) -> jax.Array:
        c = self.in_channels
        pt = self.decoder_temporal_patch_size
        p = self.decoder_patch_size
        h = w = self.decoder_token_hw
        t = x.shape[1] // (h * w)
        return einops.rearrange(
            x, "b (t h w) (pt p1 p2 c) -> b c (t pt) (h p1) (w p2)",
            t=t, h=h, w=w, pt=pt, p1=p, p2=p, c=c,
        )

    def _decode_tokens(self, z: jax.Array, num_x_tokens: Optional[int] = None):
        b = z.shape[0]
        z = z + self.get_decoder_latent_pe().astype(z.dtype)
        pq = self.get_decoder_patch_query_embed()
        if num_x_tokens is not None:
            pq = pq[:, :num_x_tokens]
        pq = jnp.broadcast_to(pq.astype(z.dtype), (b, pq.shape[1], pq.shape[2]))
        h = jnp.concatenate([z, pq], axis=1)
        h = self.decoder(h)
        h = h[:, -pq.shape[1] :, :]
        h = self.final_layer(h)
        return self.unpatchify(h)

    def decode(self, z: jax.Array) -> jax.Array:
        return self._decode_tokens(z)

    def decode_eval(self, z: jax.Array, num_x_tokens: Optional[int] = None):
        # num_x_tokens counts ENCODER patch tokens (encode_eval's output,
        # reference larp_tokenizer.py:471-482). When the decoder has its own
        # patch geometry, convert to the decoder grid — truncating decoder
        # queries by the encoder count would decode the wrong frame count.
        if num_x_tokens is not None and (
            self.decoder_temporal_patch_size != self.temporal_patch_size
            or self.decoder_patch_size != self.patch_size
        ):
            frames = (
                num_x_tokens // (self.token_hw**2) * self.temporal_patch_size
            )
            num_x_tokens = (
                frames
                // self.decoder_temporal_patch_size
                * self.decoder_token_hw**2
            )
        return self._decode_tokens(z, num_x_tokens)

    def decode_from_bottleneck(self, bottleneck_rep: jax.Array) -> jax.Array:
        if self.bottleneck_type == "vq":
            z = self.bottleneck_module.decode(bottleneck_rep)
        elif self.bottleneck_type == "fsq":
            codes = self.fsq.indices_to_codes(bottleneck_rep).astype(jnp.float32)
            z = self.fsq_out_linear(codes)
        elif self.bottleneck_type == "sq":
            z = self.sq_out_linear(self.sq.decode(bottleneck_rep))
        else:
            raise ValueError(self.bottleneck_type)
        return self.decode(z)

    # -------------------------------------------------------------- forward

    def __call__(self, data: jax.Array, train: bool = False) -> Dict[str, Any]:
        encode_output = self.encode(data, train=train)
        pred_frames = self.decode(encode_output["encoded"])
        return {"pred_frames": pred_frames, **encode_output}


def _ablation_factory(**overrides):
    """larp_tokenizer minus the 'sq' branch, FSQ-norm on the 6-d projection
    (reference models/larp_tokenizer_ablation.py)."""
    fields = set(LARPTokenizer.__dataclass_fields__)
    args = {k: v for k, v in overrides.items() if k in fields}
    args["fsq_norm_after_proj"] = True
    assert args.get("bottleneck_type", "vq") != "sq", "ablation drops the sq branch"
    return LARPTokenizer(**args)


models.update({"larp_tokenizer_ablation": _ablation_factory})
