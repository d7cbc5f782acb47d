"""Pallas-kernel parity on CPU via interpret mode.

CI has no TPU, so until now the Mosaic kernels (flash attention fwd/bwd,
single-token decode attention, fused VQ) were dead code under pytest and
only checkable by hand with tools/check_attention_tpu.py on hardware. The
`_INTERPRET` switch in ops/attention.py emulates every pallas_call on CPU;
these tests pin kernel-vs-XLA parity for the configuration axes the kernels
branch on (causal, segment ids, GQA head grouping, key_valid bias plane,
int8 scale planes). Shapes stay small — interpret mode runs the grid in
Python. Hardware runs of tools/check_attention_tpu.py remain the perf/
compile gate; this is the semantics gate.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import video_tokenizer_tpu.ops.attention  # noqa: F401  (registers module)
import video_tokenizer_tpu.ops.decode_attention  # noqa: F401
import video_tokenizer_tpu.ops.vq  # noqa: F401

_ATT = sys.modules["video_tokenizer_tpu.ops.attention"]
_DEC = sys.modules["video_tokenizer_tpu.ops.decode_attention"]
_VQ = sys.modules["video_tokenizer_tpu.ops.vq"]


@pytest.fixture(autouse=True)
def interpret_mode():
    _ATT._INTERPRET = True
    try:
        yield
    finally:
        _ATT._INTERPRET = False


class TestFlashAttentionInterpret:
    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("kv_rep", [1, 2])
    def test_fwd_and_grads_match_xla(self, causal, kv_rep):
        B, S, H, D = 1, 256, 4, 32
        Hkv = H // kv_rep
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, S, H, D))
        k = jax.random.normal(ks[1], (B, S, Hkv, D))
        v = jax.random.normal(ks[2], (B, S, Hkv, D))
        # odd segment split also exercises the masking paths
        segs = jnp.where(jnp.arange(S)[None, :] < 100, 0, 1).astype(jnp.int32)

        def f_pl(q, k, v):
            return _ATT.attention(
                q, k, v, causal=causal, segment_ids=segs,
                block_q=128, block_k=128, bwd_block_q=128, bwd_block_k=128,
                use_pallas=True,
            ).sum()

        def f_x(q, k, v):
            return _ATT.xla_attention(
                q, k, v, causal=causal, segment_ids=segs
            ).sum()

        out = _ATT.attention(
            q, k, v, causal=causal, segment_ids=segs,
            block_q=128, block_k=128, use_pallas=True,
        )
        ref = _ATT.xla_attention(q, k, v, causal=causal, segment_ids=segs)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-2
        )
        g_pl = jax.grad(f_pl, argnums=(0, 1, 2))(q, k, v)
        g_x = jax.grad(f_x, argnums=(0, 1, 2))(q, k, v)
        assert g_pl[1].shape == (B, S, Hkv, D)
        for a, b in zip(g_pl, g_x):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2)


class TestDecodeAttentionInterpret:
    @pytest.mark.parametrize("rep", [1, 3])
    @pytest.mark.parametrize("with_valid", [False, True])
    def test_matches_xla(self, rep, with_valid):
        rng = np.random.RandomState(0)
        B, S, Hkv, D = 8, 256, 2, 64
        H = Hkv * rep
        q = jnp.asarray(rng.randn(B, H, D), jnp.float32)
        kc = jnp.asarray(rng.randn(B, S, Hkv * D), jnp.float32)
        vc = jnp.asarray(rng.randn(B, S, Hkv * D), jnp.float32)
        for pos in (0, 100, S - 1):
            kv = None
            if with_valid:
                kv = jnp.asarray(rng.rand(B, S) > 0.3).at[:, pos].set(True)
            got = _DEC.decode_attention(
                q, kc, vc, jnp.int32(pos), key_valid=kv, use_pallas=True
            )
            want = _DEC.xla_decode_attention(
                q, kc, vc, jnp.int32(pos), key_valid=kv
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-2
            )

    def test_int8_scale_planes(self):
        rng = np.random.RandomState(1)
        B, S, Hkv, rep, D = 8, 256, 2, 2, 64
        H = Hkv * rep
        q = jnp.asarray(rng.randn(B, H, D), jnp.bfloat16)
        kf = jnp.asarray(rng.randn(B, S, Hkv * D), jnp.float32)
        vf = jnp.asarray(rng.randn(B, S, Hkv * D), jnp.float32)
        kq8, ks = _DEC._quantize_rows(kf)
        vq8, vs = _DEC._quantize_rows(vf)
        ksp = jnp.zeros((S, 128), jnp.float32).at[:, :B].set(ks.T)
        vsp = jnp.zeros((S, 128), jnp.float32).at[:, :B].set(vs.T)
        for pos in (0, S // 2, S - 1):
            got = _DEC.decode_attention(
                q, kq8, vq8, jnp.int32(pos),
                k_scale=ksp, v_scale=vsp, use_pallas=True,
            )
            want = _DEC.xla_decode_attention(
                q, kq8, vq8, jnp.int32(pos), k_scale=ksp, v_scale=vsp
            )
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(want, np.float32),
                atol=5e-2,
            )


class TestVQInterpret:
    def test_l2_lookup_matches_xla(self):
        rng = np.random.RandomState(2)
        # K=300 exercises the divisor-rule codebook padding (K_p=384)
        z = jnp.asarray(rng.randn(64, 16), jnp.float32)
        emb = jnp.asarray(rng.randn(300, 16), jnp.float32)
        bias = -0.5 * jnp.sum(emb**2, axis=-1)
        got = _VQ.vq_lookup_pallas(z, emb, bias)
        want = _VQ.vq_lookup_xla(z, emb, bias)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
