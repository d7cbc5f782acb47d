"""Ring attention over the 8-device mesh == single-device attention."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_tokenizer_tpu.ops.attention import xla_attention
from video_tokenizer_tpu.parallel import MeshConfig, create_mesh
from video_tokenizer_tpu.parallel.ring import ring_attention_sharded


@pytest.fixture(scope="module")
def qkv():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    B, S, H, D = 2, 8 * 16, 2, 32
    return [jax.random.normal(k, (B, S, H, D), jnp.float32) for k in ks]


class TestRingAttention:
    def test_non_causal_matches(self, qkv):
        q, k, v = qkv
        mesh = create_mesh(MeshConfig(data=8))
        ref = xla_attention(q, k, v)
        out = ring_attention_sharded(q, k, v, mesh, axis_name="data")
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_causal_matches(self, qkv):
        q, k, v = qkv
        mesh = create_mesh(MeshConfig(data=8))
        ref = xla_attention(q, k, v, causal=True)
        out = ring_attention_sharded(q, k, v, mesh, axis_name="data", causal=True)
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_sharded_inputs_stay_sharded(self, qkv):
        q, k, v = qkv
        mesh = create_mesh(MeshConfig(data=8))
        sh = NamedSharding(mesh, P(None, "data", None, None))
        qs, ks_, vs = (jax.device_put(x, sh) for x in (q, k, v))
        out = jax.jit(
            lambda a, b, c: ring_attention_sharded(a, b, c, mesh, "data")
        )(qs, ks_, vs)
        ref = xla_attention(q, k, v)
        assert np.allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    @pytest.mark.parametrize("causal", [False, True])
    def test_gradients_match_single_device(self, qkv, causal):
        """Ring attention is trainable: grads through ppermute+scan+merge
        equal single-device attention grads."""
        q, k, v = qkv
        mesh = create_mesh(MeshConfig(data=8))

        def loss_ring(q, k, v):
            out = ring_attention_sharded(q, k, v, mesh, "data", causal=causal)
            return jnp.sum(out**2)

        def loss_ref(q, k, v):
            return jnp.sum(xla_attention(q, k, v, causal=causal) ** 2)

        g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_ring, g_ref):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=5e-4)


class TestRingSequenceContext:
    """cfg `mesh_seq: N` — the ambient ring_sequence context reroutes plain
    `ops.attention.attention` calls through the ring with no model changes."""

    def test_ambient_context_matches_baseline_with_grads(self, qkv):
        from video_tokenizer_tpu.ops.attention import attention
        from video_tokenizer_tpu.parallel.ring import ring_sequence

        q, k, v = qkv
        mesh = create_mesh(MeshConfig(data=2, seq=4))

        def loss(q, k, v):
            return jnp.sum(attention(q, k, v, causal=True) ** 2)

        base = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        with ring_sequence(mesh):
            # trace INSIDE the context (the routing bakes in at trace time)
            ringed = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
        for a, b in zip(ringed, base):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=5e-4)

    def test_ineligible_call_falls_through(self, qkv):
        """Segment-id attention cannot ring; the context must leave it on
        the normal kernel rather than mis-sharding it."""
        from video_tokenizer_tpu.ops.attention import attention
        from video_tokenizer_tpu.parallel.ring import ring_sequence

        q, k, v = qkv
        seg = jnp.zeros((q.shape[0], q.shape[1]), jnp.int32)
        mesh = create_mesh(MeshConfig(data=2, seq=4))
        base = attention(q, k, v, segment_ids=seg)
        with ring_sequence(mesh):
            out = attention(q, k, v, segment_ids=seg)
        assert np.allclose(np.asarray(out), np.asarray(base), atol=1e-6)

def test_pallas_lse_custom_vjp_plumbing(monkeypatch):
    """attention_with_lse's Pallas path carries a custom VJP whose backward
    recomputes through the XLA (out, lse) attention — without it, ring
    attention would be untrainable on TPU (raw pallas_call has no AD rule).
    The pallas forward can't execute on CPU, so route the impl through the
    XLA forward: this exercises exactly the custom_vjp machinery (residuals,
    int-segment float0 cotangents, the lse cotangent path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import importlib

    A = importlib.import_module("video_tokenizer_tpu.ops.attention")

    def impl(q, k, v, q_seg, k_seg, has_segments, causal, scale,
             block_q, block_k, causal_offset):
        seg = q_seg[:, 0, :] if has_segments else None
        kseg = k_seg[:, 0, :] if has_segments else None
        return A._xla_attention_lse(
            q, k, v, causal, seg, kseg, scale, causal_offset
        )

    monkeypatch.setattr(A, "_pallas_lse_impl", impl)

    key = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (2, 16, 2, 8))
        for i in range(3)
    )
    seg = jnp.zeros((2, 16), jnp.int32).at[:, 12:].set(1)
    w = jax.random.normal(jax.random.fold_in(key, 9), (2, 16, 2, 8))

    def loss(use_pallas):
        def f(q, k, v):
            out, lse = A.attention_with_lse(
                q, k, v, causal=True, segment_ids=seg,
                use_pallas=use_pallas,
            )
            return jnp.sum(out * w) + 0.1 * jnp.sum(lse)
        return f

    g_pallas = jax.grad(loss(True), argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss(False), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pallas, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
