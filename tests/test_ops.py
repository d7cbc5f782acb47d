"""Unit tests: attention fallback, VQ lookup, FSQ round trips, sincos PEs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_tokenizer_tpu.ops import sincos
from video_tokenizer_tpu.ops.attention import attention, xla_attention
from video_tokenizer_tpu.ops.decode_attention import decode_attention
from video_tokenizer_tpu.ops.vq import vq_lookup
from video_tokenizer_tpu.models.fsq import FSQ


class TestSincos:
    def test_1d_matches_closed_form(self):
        D = 8
        pe = sincos.sincos_1d(D, np.arange(4))
        omega = 1.0 / 10000 ** (np.arange(D // 2) / (D / 2))
        # layout: [sin | cos]
        assert np.allclose(pe[2, : D // 2], np.sin(2 * omega), atol=1e-6)
        assert np.allclose(pe[2, D // 2 :], np.cos(2 * omega), atol=1e-6)
        assert np.allclose(pe[0], np.concatenate([np.zeros(D // 2), np.ones(D // 2)]))

    def test_3d_shape_and_structure(self):
        pe = sincos.sincos_3d(16, grid_size=4, frame_num=2)
        assert pe.shape == (2 * 16, 16)
        # temporal offset applies uniformly per frame
        delta = pe[16:] - pe[:16]
        assert np.allclose(delta, delta[0], atol=1e-6)

    def test_scale_factor(self):
        a = sincos.sincos_1d(8, np.arange(4), 10000)
        b = sincos.sincos_1d(8, np.arange(4), 100)
        assert not np.allclose(a, b)


class TestAttention:
    def test_xla_softmax_correctness(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 1, 4))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 1, 4))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 1, 4))
        out = xla_attention(q, k, v)
        logits = np.einsum("bqhd,bkhd->bqk", q, k) * (4**-0.5)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref = np.einsum("bqk,bkhd->bqhd", p, v)
        assert np.allclose(out, ref, atol=1e-5)

    def test_causal_masks_future(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 1, 4))
        k, v = q, q
        out = xla_attention(q, k, v, causal=True)
        # first position can only attend to itself
        assert np.allclose(out[0, 0], v[0, 0], atol=1e-5)

    def test_segment_ids_block_cross_attention(self):
        B, S, H, D = 1, 6, 1, 4
        q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D))
        seg = jnp.array([[0, 0, 0, 1, 1, 1]])
        out = xla_attention(q, q, q, segment_ids=seg)
        out_first = xla_attention(q[:, :3], q[:, :3], q[:, :3])
        assert np.allclose(out[:, :3], out_first, atol=1e-5)

    def test_dispatcher_cpu_matches_xla(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 2, 8))
        out = attention(q, q, q)  # auto-selects XLA on CPU
        assert np.allclose(out, xla_attention(q, q, q))

    def test_gqa_matches_repeated_kv(self):
        """K/V at native kv_heads width == explicit repeat to q_heads, for
        values and input gradients (XLA path on CPU; the Pallas h//rep
        index-map variant is covered by tools/check_attention_tpu.py)."""
        B, S, H, Hkv, D = 2, 12, 6, 2, 8
        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        q = jax.random.normal(ks[0], (B, S, H, D))
        k = jax.random.normal(ks[1], (B, S, Hkv, D))
        v = jax.random.normal(ks[2], (B, S, Hkv, D))
        rep = H // Hkv

        def f_gqa(q, k, v):
            return attention(q, k, v, causal=True).sum()

        def f_rep(q, k, v):
            return attention(
                q, jnp.repeat(k, rep, axis=2), jnp.repeat(v, rep, axis=2),
                causal=True,
            ).sum()

        out = attention(q, k, v, causal=True)
        ref = attention(
            q, jnp.repeat(k, rep, axis=2), jnp.repeat(v, rep, axis=2),
            causal=True,
        )
        assert out.shape == (B, S, H, D)
        assert np.allclose(out, ref, atol=1e-5)
        g = jax.grad(f_gqa, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(f_rep, argnums=(0, 1, 2))(q, k, v)
        assert g[1].shape == (B, S, Hkv, D)
        for a, b in zip(g, gr):
            assert np.allclose(a, b, atol=1e-5)

    def test_pick_block_divides_rounded_length(self):
        """Kernel block sizes must divide round_up(S, base) so padding never
        exceeds base-1 rows (TPU parity of the picked blocks is covered by
        tools/check_attention_tpu.py)."""
        from video_tokenizer_tpu.ops.attention import _pick_block, _round_up

        for S in (48, 128, 1280, 2048, 2100, 3200, 8192, 128 * 17):
            for req in (128, 512, 1024, 3072):
                b = _pick_block(S, req)
                assert b % 128 == 0 and 128 <= b <= max(req, 128)
                assert _round_up(S, 128) % b == 0, (S, req, b)
        # the motivating case: Sk=3200 with requested 3072 must not pad 2x
        assert _pick_block(3200, 3072) == 640
        # flagship S=2048 keeps its full-length single block
        assert _pick_block(2048, 3072) == 2048
        # base=8 variant (VQ M grid)
        assert _pick_block(1000, 512, base=8) % 8 == 0
        assert 1000 % _pick_block(1000, 512, base=8) == 0


class TestDecodeAttention:
    """decode_attention == the last row of full causal attention over the
    live prefix (the KV-cache decode contract). TPU-side Pallas parity is
    covered by tools/check_attention_tpu.py; CPU exercises the XLA path."""

    @pytest.mark.parametrize("Hkv,rep", [(2, 1), (2, 3)])
    def test_matches_full_attention_prefix(self, Hkv, rep):
        B, S, D = 2, 16, 8
        H = Hkv * rep
        kf = jax.random.normal(jax.random.PRNGKey(1), (B, S, Hkv, D))
        vf = jax.random.normal(jax.random.PRNGKey(2), (B, S, Hkv, D))
        for pos in [0, 5, S - 1]:
            q1 = jax.random.normal(jax.random.PRNGKey(3 + pos), (B, H, D))
            got = decode_attention(
                q1, kf.reshape(B, S, -1), vf.reshape(B, S, -1), jnp.int32(pos)
            )
            # reference: full attention over prefix [0..pos], take last query
            kr = jnp.repeat(kf[:, : pos + 1], rep, axis=2)
            vr = jnp.repeat(vf[:, : pos + 1], rep, axis=2)
            ref = xla_attention(q1[:, None], kr, vr, causal=True)[:, 0]
            assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_key_valid_drops_slots(self):
        B, S, H, D = 1, 8, 2, 4
        k = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D))
        v = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D))
        q = jax.random.normal(jax.random.PRNGKey(2), (B, H, D))
        kv = jnp.asarray([[True, False, True, True, True, True, True, True]])
        got = decode_attention(
            q, k.reshape(B, S, -1), v.reshape(B, S, -1), jnp.int32(3),
            key_valid=kv,
        )
        # reference: drop slot 1 from the prefix entirely
        keep = jnp.asarray([0, 2, 3])
        ref = xla_attention(
            q[:, None], k[:, keep], v[:, keep], causal=False
        )[:, 0]
        assert np.allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_int8_scale_planes_dequantize(self):
        """int8 cache + [S, 128] per-row scale planes ~= the fp32 cache
        (quantization error only; per-row symmetric int8 keeps relative
        error ~1/127 per element)."""
        from video_tokenizer_tpu.ops.decode_attention import _quantize_rows

        B, S, H, D = 4, 16, 2, 8
        k = jax.random.normal(jax.random.PRNGKey(0), (B, S, H * D))
        v = jax.random.normal(jax.random.PRNGKey(1), (B, S, H * D))
        q = jax.random.normal(jax.random.PRNGKey(2), (B, H, D))
        ref = decode_attention(q, k, v, jnp.int32(S - 1))

        kq, ks = _quantize_rows(k)
        vq, vs = _quantize_rows(v)
        assert kq.dtype == jnp.int8 and ks.shape == (B, S)
        # round-trip element error bounded by half a quantization step
        assert np.allclose(kq * ks[..., None], k, atol=float(ks.max()) * 0.51)
        ksp = jnp.zeros((S, 128)).at[:, :B].set(ks.T)
        vsp = jnp.zeros((S, 128)).at[:, :B].set(vs.T)
        got = decode_attention(
            q, kq, vq, jnp.int32(S - 1), k_scale=ksp, v_scale=vsp
        )
        assert np.allclose(np.asarray(got), np.asarray(ref), atol=0.03)


class TestVQLookup:
    def test_l2_argmin(self):
        z = jax.random.normal(jax.random.PRNGKey(0), (50, 6))
        emb = jax.random.normal(jax.random.PRNGKey(1), (100, 6))
        idx = vq_lookup(z, emb, metric="l2")
        d = ((np.asarray(z)[:, None] - np.asarray(emb)[None]) ** 2).sum(-1)
        assert np.array_equal(np.asarray(idx), d.argmin(1))

    def test_cos_argmax(self):
        z = jax.random.normal(jax.random.PRNGKey(0), (50, 6))
        z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
        emb = jax.random.normal(jax.random.PRNGKey(1), (64, 6))
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        idx = vq_lookup(z, emb, metric="cos")
        assert np.array_equal(np.asarray(idx), np.asarray(z @ emb.T).argmax(1))

    def test_stochastic_matches_softmax_distribution(self):
        K = 8
        emb = jax.random.normal(jax.random.PRNGKey(1), (K, 4))
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        z = jnp.tile(emb[:1], (4000, 1))
        idx = vq_lookup(
            z, emb, metric="cos", stochastic=True, inv_temp=2.0,
            key=jax.random.PRNGKey(2),
        )
        emp = np.bincount(np.asarray(idx), minlength=K) / 4000
        true = np.asarray(jax.nn.softmax(2.0 * (z[0] @ emb.T)))
        assert np.abs(emp - true).sum() / 2 < 0.06

    def test_batch_shape_preserved(self):
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 4))
        emb = jax.random.normal(jax.random.PRNGKey(1), (16, 4))
        assert vq_lookup(z, emb, metric="l2").shape == (2, 7)


class TestFSQ:
    def test_roundtrip_indices_codes(self):
        fsq = FSQ([8, 8, 8, 5, 5, 5])
        assert fsq.codebook_size == 8 * 8 * 8 * 5 * 5 * 5
        indices = jnp.arange(0, fsq.codebook_size, 997)
        codes = fsq.indices_to_codes(indices)
        back = fsq.codes_to_indices(codes)
        assert np.array_equal(np.asarray(back), np.asarray(indices))

    def test_quantize_output_is_valid_code(self):
        fsq = FSQ([8, 5])
        z = jax.random.normal(jax.random.PRNGKey(0), (100, 2)) * 3
        q = fsq.quantize(z)
        idx = fsq.codes_to_indices(q)
        assert ((idx >= 0) & (idx < 40)).all()
        assert np.allclose(np.asarray(fsq.indices_to_codes(idx)), np.asarray(q), atol=1e-6)

    def test_ste_gradient(self):
        fsq = FSQ([8, 5])

        def f(z):
            return jnp.sum(fsq.quantize(z) ** 2)

        g = jax.grad(f)(jnp.array([[0.3, -0.2]]))
        assert np.isfinite(np.asarray(g)).all()
        assert not np.allclose(np.asarray(g), 0)


class TestLeech:
    def test_golay_weight_distribution(self):
        from video_tokenizer_tpu.utils.leech import golay_codewords

        C = golay_codewords()
        w = C.sum(1)
        counts = {int(k): int((w == k).sum()) for k in np.unique(w)}
        assert counts == {0: 1, 8: 759, 12: 2576, 16: 759, 24: 1}

    def test_leech_minimal_vectors(self):
        from video_tokenizer_tpu.utils.leech import leech_minimal_vectors

        V = leech_minimal_vectors()
        assert V.shape == (196_560, 24)
        assert ((V.astype(np.int32) ** 2).sum(1) == 32).all()
