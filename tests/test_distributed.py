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
        assert mesh.shape == {"data": 8, "seq": 1, "model": 1}

    def test_create_mesh_2d(self):
        mesh = create_mesh(MeshConfig(data=4, model=2))
        assert mesh.shape == {"data": 4, "seq": 1, "model": 2}

    def test_create_mesh_seq_axis(self):
        mesh = create_mesh(MeshConfig(data=2, seq=2, model=2))
        assert mesh.shape == {"data": 2, "seq": 2, "model": 2}

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


class TestBatchNormOnMesh:
    def test_bn_bottleneck_global_stats_under_jit(self):
        """'bn_bn' bottleneck norm: jitted step on a sharded batch computes
        GLOBAL batch statistics (the SyncBatchNorm equivalent under GSPMD)."""
        import jax.numpy as jnp
        from video_tokenizer_tpu.models.bottleneck import Bottleneck

        bn = Bottleneck(
            bottleneck_dim=8, norm="bn_bn", input_dim=32, output_dim=32,
            token_nums=4,
            regularizer={"name": "vq", "args": {"codebook_size": 16}},
        )
        z = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 32))
        v = bn.init(
            {"params": jax.random.PRNGKey(1), "vq": jax.random.PRNGKey(2)},
            z, train=True,
        )

        step = jax.jit(
            lambda v, z: bn.apply(
                v, z, train=True, mutable=["batch_stats"],
                rngs={"vq": jax.random.PRNGKey(3)},
            )
        )
        # single device
        _, upd_single = step(v, z)
        # batch sharded over the 8-device mesh
        mesh = create_mesh()
        z_sh = jax.device_put(z, data_sharding(mesh, z.ndim))
        v_rep = jax.device_put(v, replicated_sharding(mesh))
        _, upd_mesh = step(v_rep, z_sh)
        for a, b in zip(
            jax.tree_util.tree_leaves(upd_single),
            jax.tree_util.tree_leaves(upd_mesh),
        ):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestHybridMesh:
    """Multi-slice (DCN) mesh layout decisions (parallel/mesh.py). Real
    multi-slice hardware is unavailable here; the layout-policy logic is
    tested with fake device objects, and the single-slice fallback is the
    path every other test in this suite runs."""

    def test_slice_count(self):
        import types

        from video_tokenizer_tpu.parallel.mesh import slice_count

        assert slice_count(jax.devices()) == 1  # CPU: no slice_index
        fakes = [types.SimpleNamespace(slice_index=i % 4) for i in range(16)]
        assert slice_count(fakes) == 4
        # None slice_index (older backends) counts as one slice
        fakes = [types.SimpleNamespace(slice_index=None) for _ in range(4)]
        assert slice_count(fakes) == 1

    def test_model_axis_cannot_span_dcn(self):
        import types

        import pytest

        from video_tokenizer_tpu.parallel.mesh import MeshConfig, create_mesh

        fakes = [types.SimpleNamespace(slice_index=i % 3) for i in range(6)]
        # data=2 not divisible by 3 slices -> model would span DCN: refuse
        with pytest.raises(ValueError, match="slices"):
            create_mesh(MeshConfig(data=2, model=3), devices=fakes)

    def test_single_slice_fallback_is_plain_reshape(self):
        from video_tokenizer_tpu.parallel.mesh import MeshConfig, create_mesh

        mesh = create_mesh(MeshConfig(data=4, model=2))
        assert mesh.shape == {"data": 4, "seq": 1, "model": 2}
        assert list(np.asarray(mesh.devices).reshape(-1)) == jax.devices()
