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
