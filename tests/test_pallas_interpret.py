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
import video_tokenizer_tpu.ops.cache_update  # noqa: F401
import video_tokenizer_tpu.ops.decode_attention  # noqa: F401
import video_tokenizer_tpu.ops.vq  # noqa: F401

_ATT = sys.modules["video_tokenizer_tpu.ops.attention"]
_CU = sys.modules["video_tokenizer_tpu.ops.cache_update"]
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
    # dtype=bf16 exercises the bf16-MXU kernel branch (mxu operand dtype
    # selection in _fwd_kernel/_bwd_*; the branch real TPU training runs)
    # with a looser tolerance; fp32 keeps the tight full-precision check
    # (ADVICE r4).
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("kv_rep", [1, 2])
    def test_fwd_and_grads_match_xla(self, causal, kv_rep, dtype):
        if dtype == jnp.bfloat16 and kv_rep == 2:
            pytest.skip("bf16 branch covered at kv_rep=1; keep the tier fast")
        B, S, H, D = 1, 256, 4, 32
        Hkv = H // kv_rep
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (B, S, H, D), dtype)
        k = jax.random.normal(ks[1], (B, S, Hkv, D), dtype)
        v = jax.random.normal(ks[2], (B, S, Hkv, D), dtype)
        atol_f, atol_g = (2e-2, 5e-2) if dtype == jnp.float32 else (1e-1, 4e-1)
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
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=atol_f,
        )
        g_pl = jax.grad(f_pl, argnums=(0, 1, 2))(q, k, v)
        g_x = jax.grad(f_x, argnums=(0, 1, 2))(q, k, v)
        assert g_pl[1].shape == (B, S, Hkv, D)
        for a, b in zip(g_pl, g_x):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=atol_g,
            )


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

    def test_gqa_padded_cache_lanes(self):
        """The real GQA zoo geometry (Hkv=5, D=64 -> KV 320) forces
        128-alignment PAD LANES in the cache (larp_ar.init_cache); the
        kernel must treat them as discarded garbage heads. Mosaic rejects
        320-lane DMA slices outright — round 2's GQA bench silently ran the
        slow XLA fallback because of this."""
        rng = np.random.RandomState(7)
        B, S, Hkv, rep, D = 8, 256, 5, 4, 64
        H, KV, KVp = Hkv * rep, Hkv * D, 384
        q = jnp.asarray(rng.randn(B, H, D), jnp.float32)
        kc = jnp.zeros((B, S, KVp)).at[:, :, :KV].set(rng.randn(B, S, KV))
        vc = jnp.zeros((B, S, KVp)).at[:, :, :KV].set(rng.randn(B, S, KV))
        for pos in (0, 100, S - 1):
            got = _DEC.decode_attention(
                q, kc, vc, jnp.int32(pos), kv_heads=Hkv, use_pallas=True
            )
            want = _DEC.xla_decode_attention(
                q, kc, vc, jnp.int32(pos), kv_heads=Hkv
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-2
            )
        # chunk variant: per-row positions over the padded cache
        G = 3
        qc = jnp.asarray(rng.randn(B, G, H, D), jnp.float32)
        posv = jnp.asarray(rng.randint(0, S - G, size=(B,)), jnp.int32)
        got = _DEC.chunk_attention(
            qc, kc, vc, posv, kv_heads=Hkv, use_pallas=True
        )
        want = _DEC.xla_chunk_attention(qc, kc, vc, posv, kv_heads=Hkv)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-2
        )


class TestChunkAttentionInterpret:
    """G-token per-row-position verification attention (speculative
    decoding). Positions are uneven across rows; parity vs the XLA einsum."""

    @pytest.mark.parametrize("rep", [1, 3])
    @pytest.mark.parametrize("with_valid", [False, True])
    def test_matches_xla(self, rep, with_valid):
        rng = np.random.RandomState(5)
        B, S, Hkv, D, G = 8, 256, 2, 64, 5
        H = Hkv * rep
        q = jnp.asarray(rng.randn(B, G, H, D), jnp.float32)
        kc = jnp.asarray(rng.randn(B, S, Hkv * D), jnp.float32)
        vc = jnp.asarray(rng.randn(B, S, Hkv * D), jnp.float32)
        pos = jnp.asarray(
            rng.randint(0, S - G, size=(B,)), jnp.int32
        ).at[0].set(0).at[1].set(S - G)
        kv = None
        if with_valid:
            kv = jnp.asarray(rng.rand(B, S) > 0.3)
        got = _DEC.chunk_attention(q, kc, vc, pos, key_valid=kv,
                                   use_pallas=True)
        want = _DEC.xla_chunk_attention(q, kc, vc, pos, key_valid=kv)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-2
        )

    def test_int8_scale_planes(self):
        rng = np.random.RandomState(6)
        B, S, Hkv, rep, D, G = 8, 256, 2, 2, 64, 4
        H = Hkv * rep
        q = jnp.asarray(rng.randn(B, G, H, D), jnp.bfloat16)
        kf = jnp.asarray(rng.randn(B, S, Hkv * D), jnp.float32)
        vf = jnp.asarray(rng.randn(B, S, Hkv * D), jnp.float32)
        kq8, ks = _DEC._quantize_rows(kf)
        vq8, vs = _DEC._quantize_rows(vf)
        ksp = jnp.zeros((S, 128), jnp.float32).at[:, :B].set(ks.T)
        vsp = jnp.zeros((S, 128), jnp.float32).at[:, :B].set(vs.T)
        pos = jnp.asarray(rng.randint(0, S - G, size=(B,)), jnp.int32)
        got = _DEC.chunk_attention(
            q, kq8, vq8, pos, k_scale=ksp, v_scale=vsp, use_pallas=True
        )
        want = _DEC.xla_chunk_attention(
            q, kq8, vq8, pos, k_scale=ksp, v_scale=vsp
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=5e-2,
        )


class TestCacheUpdateInterpret:
    """Per-row KV-cache row writes (ops/cache_update.py, the speculative-
    decoding store path). Positions are deliberately NOT 32-aligned and
    straddle window boundaries; for int8 the [S, 128] scale-plane windows
    of different batch rows OVERLAP — the sequential-grid RMW invariant the
    kernel relies on."""

    def _mk(self, dtype, B=8, S=256, KV=128, G=3, quantized=False):
        rng = np.random.RandomState(3)
        lc = {
            "k": jnp.zeros((B, S, KV), dtype),
            "v": jnp.zeros((B, S, KV), dtype),
        }
        if quantized:
            lc["ks"] = jnp.zeros((S, 128), jnp.float32)
            lc["vs"] = jnp.zeros((S, 128), jnp.float32)
        rows_k = jnp.asarray(rng.randn(B, G, KV), jnp.float32)
        rows_v = jnp.asarray(rng.randn(B, G, KV), jnp.float32)
        # uneven, unaligned, adjacent (overlapping scale-plane windows)
        pos = jnp.asarray(
            rng.randint(0, S - G, size=(B,)), jnp.int32
        ).at[0].set(0).at[1].set(S - G).at[2].set(31).at[3].set(33)
        return lc, rows_k, rows_v, pos

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_rows_match_xla(self, dtype):
        lc, rk, rv, pos = self._mk(dtype)
        got = _CU.write_rows_per_row(lc, rk, rv, pos, use_pallas=True)
        want = _CU.write_rows_per_row(lc, rk, rv, pos, use_pallas=False)
        for name in ("k", "v"):
            np.testing.assert_allclose(
                np.asarray(got[name], np.float32),
                np.asarray(want[name], np.float32),
            )

    def test_int8_scale_planes_match_xla(self):
        lc, rk, rv, pos = self._mk(jnp.int8, quantized=True)
        got = _CU.write_rows_per_row(lc, rk, rv, pos, use_pallas=True)
        want = _CU.write_rows_per_row(lc, rk, rv, pos, use_pallas=False)
        for name in ("k", "v", "ks", "vs"):
            np.testing.assert_array_equal(
                np.asarray(got[name]), np.asarray(want[name]), err_msg=name
            )

    def test_existing_rows_preserved(self):
        """The windowed RMW must not clobber neighbours of the G rows."""
        rng = np.random.RandomState(4)
        lc, rk, rv, pos = self._mk(jnp.float32)
        lc = {k: jnp.asarray(rng.randn(*v.shape), v.dtype)
              for k, v in lc.items()}
        got = _CU.write_rows_per_row(lc, rk, rv, pos, use_pallas=True)
        want = _CU.write_rows_per_row(lc, rk, rv, pos, use_pallas=False)
        np.testing.assert_allclose(np.asarray(got["k"]), np.asarray(want["k"]))
        np.testing.assert_allclose(np.asarray(got["v"]), np.asarray(want["v"]))

    def test_b_over_128_quantized_rejected(self):
        lc = {
            "k": jnp.zeros((130, 256, 128), jnp.int8),
            "v": jnp.zeros((130, 256, 128), jnp.int8),
            "ks": jnp.zeros((256, 128), jnp.float32),
            "vs": jnp.zeros((256, 128), jnp.float32),
        }
        rows = jnp.zeros((130, 2, 128), jnp.float32)
        pos = jnp.zeros((130,), jnp.int32)
        with pytest.raises(ValueError, match="128"):
            _CU.write_rows_per_row(lc, rows, rows, pos)


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


class TestW8MatmulInterpret:
    """Weight-only int8 projection kernel (ops/quant_matmul.py) vs its XLA
    fallback — identical algebra (bf16 operands, fp32 accum + scale), so
    parity is tight."""

    @pytest.mark.parametrize("m", [3, 16, 70])  # pad path, one block, two
    def test_matches_fallback(self, m):
        from video_tokenizer_tpu.ops.quant_matmul import w8_matmul

        rng = np.random.RandomState(0)
        K, N = 256, 384  # N % 128 == 0 but not % 256: exercises block pick
        x = jnp.asarray(rng.randn(m, K), jnp.bfloat16)
        w8 = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
        scale = jnp.asarray(rng.rand(N) * 0.1 + 0.01, jnp.float32)

        got = w8_matmul(x, w8, scale)  # interpret fixture -> Pallas path
        _ATT._INTERPRET = False
        try:
            want = w8_matmul(x, w8, scale)  # CPU backend -> XLA fallback
        finally:
            _ATT._INTERPRET = True
        assert got.dtype == x.dtype and got.shape == (m, N)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-2, atol=2e-2,
        )

    def test_batched_leading_dims(self):
        from video_tokenizer_tpu.ops.quant_matmul import w8_matmul

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 5, 128), jnp.float32)
        w8 = jnp.asarray(rng.randint(-127, 128, (128, 128)), jnp.int8)
        scale = jnp.ones((128,), jnp.float32)
        y = w8_matmul(x, w8, scale)
        assert y.shape == (2, 5, 128) and y.dtype == jnp.float32
        # the kernel computes in bf16 by design — reference matches that
        xb = np.asarray(x.astype(jnp.bfloat16), np.float32)
        want = xb @ np.asarray(w8, np.float32)
        np.testing.assert_allclose(
            np.asarray(y, np.float32), want, rtol=2e-2, atol=2e-1,
        )
