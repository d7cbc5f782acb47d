"""Weight-conversion parity: torch reference layers == converted Flax layers.

Reimplements the reference's layer semantics in torch (timm Block,
Conv3d patchify, llama block with fused wqkv/GQA/SwiGLU/RMSNorm, and the full
tokenizer encode->VQ->decode path) with random weights, converts the state
dicts through tools/convert_reference_tokenizer.py, and checks our Flax
modules produce the same outputs. This validates every mapping needed to load
the public LARP checkpoints for the golden-number runs.
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_reference_tokenizer import (  # noqa: E402
    convert_larp_ar,
    convert_larp_tokenizer,
    convert_patch_embed3d,
    convert_timm_block,
)


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


class TorchTimmBlock(nn.Module):
    """timm Block semantics as used by the reference (qkv_bias=False)."""

    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(dim)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3, bias=False)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)

    def forward(self, x):
        B, N, C = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(B, N, 3, self.heads, C // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        a = F.scaled_dot_product_attention(q, k, v)
        a = a.transpose(1, 2).reshape(B, N, C)
        x = x + self.attn.proj(a)
        h = self.norm2(x)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(h)))


class TestTimmBlockConversion:
    def test_block_output_matches(self):
        torch.manual_seed(0)
        tb = TorchTimmBlock(32, 4).eval()
        x = torch.randn(2, 10, 32)
        with torch.no_grad():
            ref = tb(x).numpy()

        from video_tokenizer_tpu.models.transformer import ViTBlock

        params = convert_timm_block(
            {f"b.{k}": v for k, v in _sd(tb).items()}, "b"
        )
        blk = ViTBlock(32, 4)
        out = blk.apply({"params": params}, jnp.asarray(x.numpy()))
        assert np.allclose(np.asarray(out), ref, atol=2e-5)


class TestPatchEmbedConversion:
    def test_conv3d_equals_dense(self):
        torch.manual_seed(0)
        conv = nn.Conv3d(3, 16, kernel_size=(2, 4, 4), stride=(2, 4, 4))
        x = torch.randn(2, 3, 4, 8, 8)
        with torch.no_grad():
            ref = conv(x).flatten(2).transpose(1, 2).numpy()  # B, N, D

        from video_tokenizer_tpu.models.embed import PatchEmbed3D

        params = {"proj": convert_patch_embed3d(
            {f"p.{k}": v for k, v in _sd(conv).items()}, "p"
        )}
        pe = PatchEmbed3D(spatial_patch_size=4, temporal_patch_size=2, embed_dim=16)
        out = pe.apply({"params": params}, jnp.asarray(x.numpy()))
        assert np.allclose(np.asarray(out), ref, atol=2e-5)


class TorchRMSNorm(nn.Module):
    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        out = x * torch.rsqrt(torch.mean(x * x, dim=-1, keepdim=True) + self.eps)
        return out * self.weight


class TorchLlamaMini(nn.Module):
    """Reference LARP_AR training-path semantics (larp_ar.py:334-395)."""

    def __init__(self, dim=32, n_layer=2, n_head=4, n_kv_head=2, vocab=16,
                 n_classes=5, seq=8, class_dropout=0.1):
        super().__init__()
        self.dim, self.n_head, self.n_kv_head = dim, n_head, n_kv_head
        self.hd = dim // n_head
        hidden = 2 * 4 * dim // 3
        hidden = ((hidden + 31) // 32) * 32  # multiple_of=32 for the test
        self.tok_embeddings = nn.Embedding(vocab, dim)
        self.cls_embedding = nn.Module()
        # reference sizes the table num_classes + int(dropout > 0)
        # (larp_ar.py:246-257 / embed.py LabelEmbedder)
        self.cls_embedding.embedding_table = nn.Embedding(
            n_classes + int(class_dropout > 0), dim
        )
        self.abs_pe = nn.Parameter(torch.randn(1, seq, dim) * 0.02)
        self.layers = nn.ModuleList()
        for _ in range(n_layer):
            l = nn.Module()
            l.attention = nn.Module()
            l.attention.wqkv = nn.Linear(
                dim, (n_head + 2 * n_kv_head) * self.hd, bias=False
            )
            l.attention.wo = nn.Linear(dim, dim, bias=False)
            l.feed_forward = nn.Module()
            l.feed_forward.w1 = nn.Linear(dim, hidden, bias=False)
            l.feed_forward.w3 = nn.Linear(dim, hidden, bias=False)
            l.feed_forward.w2 = nn.Linear(hidden, dim, bias=False)
            l.attention_norm = TorchRMSNorm(dim)
            l.ffn_norm = TorchRMSNorm(dim)
            self.layers.append(l)
        self.norm = TorchRMSNorm(dim)
        self.output = nn.Linear(dim, vocab, bias=False)

    def forward(self, idx, cond):
        cond_emb = self.cls_embedding.embedding_table(cond).unsqueeze(1)
        h = torch.cat([cond_emb, self.tok_embeddings(idx)], dim=1)
        h = h + self.abs_pe[:, : h.shape[1]]
        for l in self.layers:
            x = l.attention_norm(h)
            B, S, _ = x.shape
            qkv = l.attention.wqkv(x)
            kv = self.n_kv_head * self.hd
            q, k, v = qkv.split([self.dim, kv, kv], dim=-1)
            q = q.view(B, S, self.n_head, self.hd).transpose(1, 2)
            k = k.view(B, S, self.n_kv_head, self.hd).transpose(1, 2)
            v = v.view(B, S, self.n_kv_head, self.hd).transpose(1, 2)
            k = k.repeat_interleave(self.n_head // self.n_kv_head, dim=1)
            v = v.repeat_interleave(self.n_head // self.n_kv_head, dim=1)
            a = F.scaled_dot_product_attention(q, k, v, is_causal=True)
            a = a.transpose(1, 2).reshape(B, S, self.dim)
            h = h + l.attention.wo(a)
            x = l.ffn_norm(h)
            h = h + l.feed_forward.w2(
                F.silu(l.feed_forward.w1(x)) * l.feed_forward.w3(x)
            )
        return self.output(self.norm(h))


class TestARConversion:
    def test_full_forward_matches(self):
        torch.manual_seed(0)
        tm = TorchLlamaMini().eval()
        idx = torch.randint(0, 16, (2, 7))
        cond = torch.tensor([1, 3])
        with torch.no_grad():
            ref = tm(idx, cond).numpy()

        from video_tokenizer_tpu.models.larp_ar import LARP_AR, ModelArgs

        params = convert_larp_ar(_sd(tm))
        model = LARP_AR(ModelArgs(
            dim=32, n_layer=2, n_head=4, n_kv_head=2, vocab_size=16,
            num_classes=5, max_seq_len=8, cls_token_num=1, multiple_of=32,
            token_dropout_p=0.0, resid_dropout_p=0.0, ffn_dropout_p=0.0,
            class_dropout_prob=0.1,
        ))
        logits, _ = model.apply(
            {"params": params}, jnp.asarray(idx.numpy()), jnp.asarray(cond.numpy())
        )
        assert np.allclose(np.asarray(logits), ref, atol=5e-5)

    def test_null_row_padding_for_dropout_zero_source(self):
        """A reference model built with class_dropout_prob == 0 has a bare
        num_classes-row class table (larp_ar.py:246-257); conversion with the
        num_classes hint appends the zero null row our LabelEmbedder always
        allocates, and the padded params drive our model."""
        torch.manual_seed(1)
        tm = TorchLlamaMini(class_dropout=0.0).eval()
        sd = _sd(tm)
        assert sd["cls_embedding.embedding_table.weight"].shape[0] == 5

        params = convert_larp_ar(sd, num_classes=5)
        table = params["cls_embedding"]["embedding_table"]["embedding"]
        assert table.shape[0] == 6
        np.testing.assert_array_equal(table[5], np.zeros_like(table[5]))

        from video_tokenizer_tpu.models.larp_ar import LARP_AR, ModelArgs

        model = LARP_AR(ModelArgs(
            dim=32, n_layer=2, n_head=4, n_kv_head=2, vocab_size=16,
            num_classes=5, max_seq_len=8, cls_token_num=1, multiple_of=32,
            token_dropout_p=0.0, resid_dropout_p=0.0, ffn_dropout_p=0.0,
            class_dropout_prob=0.0,
        ))
        idx = torch.randint(0, 16, (2, 7))
        cond = torch.tensor([1, 3])
        with torch.no_grad():
            ref = tm(idx, cond).numpy()
        logits, _ = model.apply(
            {"params": params}, jnp.asarray(idx.numpy()),
            jnp.asarray(cond.numpy()),
        )
        assert np.allclose(np.asarray(logits), ref, atol=5e-5)


class TorchTinyTokenizer(nn.Module):
    """Reference tokenizer forward (deterministic VQ) at tiny scale."""

    def __init__(self, dim=32, heads=4, depth=1, n_tok=4, cb=16, bdim=8):
        super().__init__()
        from video_tokenizer_tpu.ops import sincos

        self.n_tok = n_tok
        self.x_embedder = nn.Module()
        self.x_embedder.proj = nn.Conv3d(3, dim, (2, 4, 4), (2, 4, 4))
        self.encoder = nn.Module()
        self.encoder.blocks = nn.ModuleList(
            [TorchTimmBlock(dim, heads) for _ in range(depth)]
        )
        self.decoder = nn.Module()
        self.decoder.blocks = nn.ModuleList(
            [TorchTimmBlock(dim, heads) for _ in range(depth)]
        )
        self.encoder_latent_query_embed = nn.Parameter(torch.randn(n_tok, dim) * 0.02)
        self.bottleneck = nn.Module()
        self.bottleneck.in_linear = nn.Linear(dim, bdim)
        self.bottleneck.out_linear = nn.Linear(bdim, dim)
        self.bottleneck.regularizer = nn.Module()
        self.bottleneck.regularizer.embedding = nn.Embedding(cb, bdim)
        self.final_layer = nn.Module()
        self.final_layer.norm_final = nn.LayerNorm(dim, eps=1e-6)
        self.final_layer.linear = nn.Linear(dim, 2 * 4 * 4 * 3)
        # fixed sin-cos buffers, identical generators to ours
        t, hw = 2, 2  # 4 frames /2, 8px /4
        self.enc_pe = torch.from_numpy(
            sincos.sincos_3d(dim, hw, t)
        ).float().reshape(1, -1, dim)
        self.dec_latent_pe = torch.from_numpy(
            sincos.sincos_1d(dim, np.arange(n_tok))
        ).float().reshape(1, n_tok, dim)
        self.dec_patch_pe = torch.from_numpy(
            sincos.sincos_3d(dim, hw, t)
        ).float().reshape(1, -1, dim)

    def forward(self, x):
        import einops as E

        tok = self.x_embedder.proj(x).flatten(2).transpose(1, 2)
        tok = tok + self.enc_pe
        B = tok.shape[0]
        q = self.encoder_latent_query_embed.unsqueeze(0).repeat(B, 1, 1)
        h = torch.cat([tok, q], dim=1)
        for b in self.encoder.blocks:
            h = b(h)
        z = h[:, -self.n_tok :]
        # bottleneck: l2-normalized deterministic VQ
        z = self.bottleneck.in_linear(z)
        emb = F.normalize(self.bottleneck.regularizer.embedding.weight, dim=-1)
        zf = F.normalize(z, dim=-1).reshape(-1, z.shape[-1])
        d = (zf**2).sum(1, keepdim=True) + (emb**2).sum(1) - 2 * zf @ emb.t()
        idx = d.argmin(1)
        quant = emb[idx].view(z.shape)
        z = self.bottleneck.out_linear(quant)
        # decode
        z = z + self.dec_latent_pe
        pq = self.dec_patch_pe.repeat(B, 1, 1)
        h = torch.cat([z, pq], dim=1)
        for b in self.decoder.blocks:
            h = b(h)
        h = h[:, -pq.shape[1] :]
        h = self.final_layer.linear(self.final_layer.norm_final(h))
        t_ = h.shape[1] // 4
        h = h.reshape(B, t_, 2, 2, 2, 4, 4, 3)
        return E.rearrange(h, "b t h w pt p1 p2 c -> b c (t pt) (h p1) (w p2)"), idx.view(B, -1)


class TestTokenizerConversion:
    def test_full_forward_matches(self):
        torch.manual_seed(0)
        tt = TorchTinyTokenizer().eval()
        x = torch.rand(2, 3, 4, 8, 8)
        with torch.no_grad():
            ref, ref_idx = tt(x)

        from video_tokenizer_tpu.models import LARPTokenizer

        params = convert_larp_tokenizer(_sd(tt))
        model = LARPTokenizer(
            bottleneck={
                "name": "bottleneck",
                "args": {
                    "bottleneck_dim": 8, "norm": "none",
                    "regularizer": {
                        "name": "vq",
                        "args": {
                            "codebook_size": 16, "l2_normalized": True,
                            "stochastic": False,
                        },
                    },
                },
            },
            prior_model={"name": "none"},
            bottleneck_token_num=4, input_size=8, frame_num=4,
            temporal_patch_size=2, patch_size=4,
            decoder_temporal_patch_size=2, decoder_patch_size=4,
            encoder_hidden_size=32, decoder_hidden_size=32,
            encoder_num_heads=4, decoder_num_heads=4,
            encoder_depth=1, decoder_depth=1,
        )
        out = model.apply(
            {"params": params}, jnp.asarray(x.numpy()),
            rngs={"vq": jax.random.PRNGKey(0)},
        )
        assert np.array_equal(np.asarray(out["bottleneck_rep"]), ref_idx.numpy())
        assert np.allclose(
            np.asarray(out["pred_frames"]), ref.numpy(), atol=5e-5
        )


def test_lpips_state_dict_mapping_uses_global_indices():
    """The lpips package registers VGG convs under their GLOBAL torchvision
    feature index inside each slice (net.slice2.5.weight = feature 5) —
    the converter must map all 13 convs without adding slice offsets."""
    import numpy as np

    from video_tokenizer_tpu.models.lpips import load_torch_lpips_state_dict

    tv_conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    out_ch = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    in_ch = [3] + out_ch[:-1]
    slices = {1: range(0, 4), 2: range(4, 9), 3: range(9, 16),
              4: range(16, 23), 5: range(23, 30)}
    sd = {}
    for ci, tv in enumerate(tv_conv_idx):
        s = next(k for k, r in slices.items() if tv in r)
        sd[f"net.slice{s}.{tv}.weight"] = np.zeros(
            (out_ch[ci], in_ch[ci], 3, 3), np.float32
        )
        sd[f"net.slice{s}.{tv}.bias"] = np.zeros((out_ch[ci],), np.float32)
    taps = [64, 128, 256, 512, 512]
    for i, c in enumerate(taps):
        sd[f"lin{i}.model.1.weight"] = np.zeros((1, c, 1, 1), np.float32)

    params = load_torch_lpips_state_dict(sd)
    assert len(params["net"]) == 13
    for ci in range(13):
        k = params["net"][f"conv{ci}"]["kernel"]
        assert k.shape == (3, 3, in_ch[ci], out_ch[ci]), (ci, k.shape)
    for i, c in enumerate(taps):
        assert params[f"lin{i}"].shape == (1, 1, 1, c)
