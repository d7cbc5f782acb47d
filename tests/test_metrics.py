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


class TestMILO:
    """MILO mask-based perceptual metric (reference
    models/model_titok/metrics/milo.py:22-127)."""

    def _init(self, H=32, W=32):
        from video_tokenizer_tpu.metrics.milo import MILO

        m = MILO()
        x = jnp.zeros((2, 3, H, W))
        variables = m.init(jax.random.PRNGKey(0), x, x)
        return m, variables

    def test_identical_inputs_score_zero(self, rng):
        m, variables = self._init()
        x = jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32)).clip(-1, 1)
        s = m.apply(variables, x, x)
        assert s.shape == (2,)
        assert np.allclose(np.asarray(s), 0.0, atol=1e-7)

    def test_mask_and_score_behavior(self, rng):
        m, variables = self._init()
        x = jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32)).clip(-1, 1)
        y = jnp.clip(x + 0.5 * rng.randn(*x.shape).astype(np.float32), -1, 1)
        s = m.apply(variables, y, x)
        assert np.all(np.isfinite(np.asarray(s))) and np.all(np.asarray(s) >= 0)

    def test_odd_size_replicate_pad(self, rng):
        # 36x36 -> coarsest 4x4, but 40x44 exercises per-axis odd pyramid dims
        m, variables = self._init(H=36, W=44)
        x = jnp.asarray(rng.randn(1, 3, 36, 44).astype(np.float32)).clip(-1, 1)
        y = -x
        s = m.apply(variables, y, x)
        assert np.isfinite(float(s[0]))

    def test_torch_parity(self, rng):
        """Random-weight output parity against a torch reimplementation of
        the reference network, through load_torch_milo_state_dict."""
        torch = pytest.importorskip("torch")
        import torch.nn as tnn
        import torch.nn.functional as tF
        import math

        class TorchMaskFinder(tnn.Module):
            def __init__(self):
                super().__init__()
                self.netBasic = tnn.Sequential(
                    tnn.Conv2d(7, 32, 3, 1, 1), tnn.ReLU(),
                    tnn.Conv2d(32, 64, 3, 1, 1), tnn.ReLU(),
                    tnn.Conv2d(64, 32, 3, 1, 1), tnn.ReLU(),
                    tnn.Conv2d(32, 16, 3, 1, 1), tnn.ReLU(),
                    tnn.Conv2d(16, 1, 3, 1, 1),
                )

            def forward(self, x):
                return torch.sigmoid(self.netBasic(x))

        class TorchScaler(tnn.Module):
            def __init__(self):
                super().__init__()
                self.model = tnn.Sequential(
                    tnn.Conv2d(1, 32, 1), tnn.LeakyReLU(0.2),
                    tnn.Conv2d(32, 32, 1), tnn.LeakyReLU(0.2),
                    tnn.Conv2d(32, 1, 1), tnn.Sigmoid(),
                )

        class TorchMILO(tnn.Module):
            def __init__(self):
                super().__init__()
                self.mask_finder_1 = TorchMaskFinder()
                self.scaler_network = TorchScaler()
                self.number_of_scales = 3

            def mask_generator(self, y, x):
                refScale, distScale = [x], [y]
                for _ in range(self.number_of_scales):
                    refScale.insert(0, tF.avg_pool2d(refScale[0], 2, 2,
                                                     count_include_pad=False))
                    distScale.insert(0, tF.avg_pool2d(distScale[0], 2, 2,
                                                      count_include_pad=False))
                mask = refScale[0].new_zeros(
                    refScale[0].shape[0], 1,
                    int(math.floor(refScale[0].shape[2] / 2.0)),
                    int(math.floor(refScale[0].shape[3] / 2.0)))
                for lv in range(len(refScale)):
                    up = tF.interpolate(mask, scale_factor=2, mode="bilinear",
                                        align_corners=True)
                    if up.shape[2] != refScale[lv].shape[2]:
                        up = tF.pad(up, [0, 0, 0, 1], mode="replicate")
                    if up.shape[3] != refScale[lv].shape[3]:
                        up = tF.pad(up, [0, 1, 0, 0], mode="replicate")
                    mask = self.mask_finder_1(
                        torch.cat([refScale[lv], distScale[lv], up], 1)) + up
                return mask

            def forward(self, y, x):
                x = (x.clamp(-1, 1) + 1) / 2
                y = (y.clamp(-1, 1) + 1) / 2
                mask = self.mask_generator(x, y)
                return (mask * torch.abs(x - y)).mean(dim=(1, 2, 3))

        from video_tokenizer_tpu.metrics.milo import (
            MILO, load_torch_milo_state_dict,
        )

        tm = TorchMILO()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        variables = jax.tree_util.tree_map(
            jnp.asarray, load_torch_milo_state_dict(sd)
        )

        x = rng.randn(2, 3, 32, 32).astype(np.float32).clip(-1, 1)
        y = np.clip(x + 0.4 * rng.randn(*x.shape).astype(np.float32), -1, 1)
        with torch.no_grad():
            ref = tm(torch.from_numpy(y), torch.from_numpy(x)).numpy()
        got = np.asarray(MILO().apply(variables, jnp.asarray(y), jnp.asarray(x)))
        assert np.allclose(got, ref, atol=1e-5), (got, ref)
