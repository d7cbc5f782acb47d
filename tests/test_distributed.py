"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from video_tokenizer_tpu.parallel import (
    MeshConfig, create_mesh, data_sharding, replicated_sharding, shard_batch,
)


class TestMesh:
    def test_eight_devices(self):
        assert jax.device_count() == 8

    def test_create_mesh_default(self):
        mesh = create_mesh()
        assert mesh.shape == {"data": 8, "model": 1}

    def test_create_mesh_2d(self):
        mesh = create_mesh(MeshConfig(data=4, model=2))
        assert mesh.shape == {"data": 4, "model": 2}

    def test_bad_mesh_raises(self):
        with pytest.raises(ValueError):
            create_mesh(MeshConfig(data=3, model=2))

    def test_shard_batch_places_on_data_axis(self):
        mesh = create_mesh()
        batch = {"gt": np.random.rand(8, 3, 4, 8, 8).astype(np.float32)}
        dev = shard_batch(mesh, batch)
        shard_shapes = {
            s.data.shape for s in dev["gt"].addressable_shards
        }
        assert shard_shapes == {(1, 3, 4, 8, 8)}

    def test_gradient_averaging_matches_single_device(self):
        """DP grads over the mesh == grads of the full batch on one device."""
        mesh = create_mesh()
        w = jnp.ones((4, 4))
        x = np.random.rand(8, 4).astype(np.float32)

        def loss(w, x):
            return jnp.mean((x @ w) ** 2)

        g_single = jax.grad(loss)(w, jnp.asarray(x))
        x_sharded = jax.device_put(x, data_sharding(mesh, 2))
        w_rep = jax.device_put(w, replicated_sharding(mesh))
        g_mesh = jax.jit(jax.grad(loss))(w_rep, x_sharded)
        assert np.allclose(np.asarray(g_mesh), np.asarray(g_single), atol=1e-6)


class TestDistributedTrainStep:
    def test_tokenizer_train_step_on_mesh(self):
        """One real GAN train step over all 8 devices, batch sharded."""
        import __graft_entry__ as g

        g.dryrun_multichip(8)


class TestCollectivePatterns:
    def test_psum_feature_stats(self):
        """FVD sufficient statistics accumulate via psum over the mesh."""
        mesh = create_mesh()
        feats = np.random.rand(8, 16).astype(np.float64)

        @jax.jit
        def stats(x):
            return jnp.sum(x, axis=0), x.T @ x, jnp.asarray(x.shape[0], jnp.float64)

        x = jax.device_put(feats, data_sharding(mesh, 2))
        s, ss, n = stats(x)
        assert np.allclose(np.asarray(s), feats.sum(0), atol=1e-9)
        assert np.allclose(np.asarray(ss), feats.T @ feats, atol=1e-9)
