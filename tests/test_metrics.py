"""Metrics tests: FeatureStats, Fréchet distance, SSIM, I3D shapes."""
import numpy as np
import pytest

from video_tokenizer_tpu.metrics.fvd import (
    FeatureStats, FVDCalculator, frechet_distance, trace_sqrt_product,
)
from video_tokenizer_tpu.metrics import statistics as stats

import jax
import jax.numpy as jnp


class TestFeatureStats:
    def test_streaming_mean_cov(self, rng):
        x = rng.randn(500, 16)
        fs = FeatureStats(capture_mean_cov=True)
        for chunk in np.array_split(x, 7):
            fs.append(chunk)
        mu, cov = fs.get_mean_cov()
        assert np.allclose(mu, x.mean(0), atol=1e-6)
        assert np.allclose(cov, np.cov(x.T, bias=True), atol=1e-5)

    def test_merge_equals_joint(self, rng):
        x = rng.randn(200, 8)
        a = FeatureStats(capture_mean_cov=True)
        b = FeatureStats(capture_mean_cov=True)
        a.append(x[:80])
        b.append(x[80:])
        merged = a + b
        joint = FeatureStats(capture_mean_cov=True)
        joint.append(x)
        ma, ca = merged.get_mean_cov()
        mj, cj = joint.get_mean_cov()
        assert np.allclose(ma, mj) and np.allclose(ca, cj)

    def test_max_items_clipping(self, rng):
        fs = FeatureStats(capture_mean_cov=True, max_items=10)
        fs.append(rng.randn(7, 4))
        fs.append(rng.randn(7, 4))
        assert fs.num_items == 10 and fs.is_full()

    def test_save_load_roundtrip(self, rng, tmp_path):
        fs = FeatureStats(capture_mean_cov=True)
        fs.append(rng.randn(20, 4))
        p = tmp_path / "s.pkl"
        fs.save(p)
        fs2 = FeatureStats.load(p)
        assert np.allclose(fs.get_mean_cov()[0], fs2.get_mean_cov()[0])


class TestFrechet:
    def test_identical_distributions_zero(self, rng):
        x = rng.randn(300, 8)
        mu, cov = x.mean(0), np.cov(x.T, bias=True)
        assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6

    def test_mean_shift_only(self):
        d = 4
        cov = np.eye(d)
        mu1, mu2 = np.zeros(d), np.ones(d)
        assert np.isclose(frechet_distance(mu1, cov, mu2, cov), d, atol=1e-6)

    def test_against_scipy_sqrtm(self, rng):
        try:
            from scipy.linalg import sqrtm
        except ImportError:
            pytest.skip("scipy not available")
        a = rng.randn(6, 6)
        b = rng.randn(6, 6)
        s1 = a @ a.T + 0.1 * np.eye(6)
        s2 = b @ b.T + 0.1 * np.eye(6)
        ours = trace_sqrt_product(s1, s2)
        ref = np.trace(sqrtm(s1 @ s2)).real
        assert np.isclose(ours, ref, rtol=1e-5)

    def test_fvd_separates_distributions(self, rng):
        same_a = rng.randn(400, 8)
        same_b = rng.randn(400, 8)
        diff = rng.randn(400, 8) * 3 + 2
        def mk(x):
            fs = FeatureStats(capture_mean_cov=True)
            fs.append(x)
            return fs
        calc = FVDCalculator.__new__(FVDCalculator)  # skip I3D init
        close = calc.calculate_fvd(mk(same_a), mk(same_b))
        far = calc.calculate_fvd(mk(same_a), mk(diff))
        assert far > close * 5


class TestSSIM:
    def test_identical_is_one(self, rng):
        x = jnp.asarray(rng.rand(2, 3, 16, 16).astype(np.float32))
        assert float(stats.ssim(x, x)) > 0.999

    def test_noise_lowers_ssim(self, rng):
        x = jnp.asarray(rng.rand(2, 3, 32, 32).astype(np.float32))
        y = jnp.clip(x + 0.3 * rng.randn(2, 3, 32, 32).astype(np.float32), 0, 1)
        assert float(stats.ssim(x, y)) < 0.8


class TestTopkAccuracy:
    def test_exact(self):
        logits = jnp.asarray([[1.0, 2.0, 3.0], [3.0, 2.0, 1.0]])
        targets = jnp.asarray([2, 1])
        acc = stats.topk_accuracy(logits, targets, ks=(1, 2))
        assert float(acc["top1"]) == 0.5
        assert float(acc["top2"]) == 1.0


class TestI3D:
    @pytest.mark.slow
    def test_random_init_shapes(self):
        from video_tokenizer_tpu.metrics.i3d import I3DFeatureExtractor

        ex = I3DFeatureExtractor()
        v = jnp.zeros((1, 3, 16, 64, 64))
        feats = ex(v)
        assert feats.shape == (1, 400)
