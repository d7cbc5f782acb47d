"""Config system + dataset/loader tests."""
import os
import textwrap

import numpy as np
import pytest

from video_tokenizer_tpu.config import (
    ConfigDict, apply_dotted_overrides, coerce_value, load_config,
    substitute_vars,
)
from video_tokenizer_tpu.data import VideoDataset, VideoTransform, epoch_loader


class TestConfig:
    def test_var_substitution(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("a: $x$\nb:\n  c: $y$\n")
        cfg = load_config(str(p), variables={"x": 5, "y": "hello"})
        assert cfg.a == 5
        assert cfg.b.c == "hello"

    def test_dotted_overrides_with_coercion(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("model:\n  args:\n    lr: 0.1\n    flag: false\n")
        cfg = load_config(
            str(p),
            opts=["model.args.lr", "0.0001", "model.args.flag", "true",
                  "model.args.new_key", "7", "deep.new.path", "x"],
        )
        assert cfg.model.args.lr == 0.0001
        assert cfg.model.args.flag is True
        assert cfg.model.args.new_key == 7
        assert cfg.deep.new.path == "x"

    def test_coerce(self):
        assert coerce_value("true") is True
        assert coerce_value("False") is False
        assert coerce_value("3") == 3
        assert coerce_value("3.5") == 3.5
        assert coerce_value("none") is None
        assert coerce_value("hello") == "hello"

    def test_odd_opts_raises(self):
        with pytest.raises(ValueError):
            apply_dotted_overrides({}, ["a.b"])

    def test_attribute_access_and_to_dict(self):
        cfg = ConfigDict({"a": {"b": [1, {"c": 2}]}})
        assert cfg.a.b[1].c == 2
        d = cfg.to_dict()
        assert isinstance(d["a"], dict) and not isinstance(d["a"], ConfigDict)

    def test_train_cli_wandb_flags(self, tmp_path):
        """Reference launcher's wandb flags (train.py:36-38, incl. its
        `--wandn_entity` spelling) map into the cfg keys BaseTrainer reads."""
        import train as train_cli

        p = tmp_path / "c.yaml"
        p.write_text("trainer: t\n")
        args = train_cli.parse_args([
            "--cfg", str(p), "--manualSeed", "0", "-w",
            "--wandn_entity", "me", "--wandb_project", "proj",
        ])
        assert args.wandb_upload and args.wandb_entity == "me"
        cfg = train_cli.make_cfg(args)
        assert cfg["wandb_upload"] is True
        assert cfg["wandb_entity"] == "me"
        assert cfg["wandb_project"] == "proj"

        args = train_cli.parse_args(["--cfg", str(p), "--manualSeed", "0"])
        cfg = train_cli.make_cfg(args)
        assert "wandb_upload" not in cfg  # absent flags leave cfg untouched


class TestFakeDataset:
    def test_null128(self):
        ds = VideoDataset(
            root_path="/tmp", frame_num=4, cls_vid_num="-1_-1",
            crop_size=16, csv_file="null128", split="train",
        )
        assert len(ds) == 128
        assert ds.num_classes == 101
        item = ds[0]
        assert item["gt"].shape == (3, 4, 16, 16)
        # default ships uint8 [0,255]; trainers normalize on-device
        assert item["gt"].dtype == np.uint8
        assert item["label"] == 0 and ds[5]["label"] == 5

    def test_float32_mode_matches_uint8(self):
        from video_tokenizer_tpu.utils.common import video_to_float

        kw = dict(
            root_path="/tmp", frame_num=4, cls_vid_num="-1_-1",
            crop_size=16, csv_file="null128", split="test",
        )
        a = VideoDataset(output_dtype="float32", **kw)[3]["gt"]
        b = VideoDataset(output_dtype="uint8", **kw)[3]["gt"]
        assert a.dtype == np.float32 and 0.0 <= a.min() and a.max() <= 1.0
        # same eval rng -> same clip; u8 path quantizes to 1/255 grid
        assert np.abs(video_to_float(b) - a).max() <= (0.5 / 255 + 1e-6)

    def test_loader_batches(self):
        ds = VideoDataset(
            root_path="/tmp", frame_num=4, cls_vid_num="-1_-1",
            crop_size=16, csv_file="null128", split="train",
        )
        it = epoch_loader(ds, batch_size=16, num_workers=0, seed=0)
        batches = list(it)
        assert len(batches) == 8
        assert batches[0]["gt"].shape == (16, 3, 4, 16, 16)

    def test_csv_dataset_parsing(self, tmp_path):
        csv = tmp_path / "mini_test.csv"
        rows = ["id,path,action,label"]
        for i, (act, lbl) in enumerate([("A", 0), ("A", 0), ("B", 1)]):
            rows.append(f"{i},/fake/v_{act}_g0{i}.avi,{act},{lbl}")
        csv.write_text("\n".join(rows))
        ds = VideoDataset(
            root_path=str(tmp_path), frame_num=4, cls_vid_num="-1_1",
            crop_size=16, csv_file="mini_test.csv", split="train",
        )
        # vid_num=1 per class -> 2 videos
        assert len(ds) == 2


class TestVideoTransform:
    def test_eval_resize_center_crop(self):
        tfm = VideoTransform(crop_size=8, eval_tfm=True)
        v = np.random.rand(3, 2, 20, 30).astype(np.float32)
        out = tfm(v)
        assert out.shape == (3, 2, 8, 8)

    def test_train_random_resized_crop(self):
        tfm = VideoTransform(crop_size=8, scale=0.8, ratio=1.0, eval_tfm=False)
        v = np.random.rand(3, 2, 16, 16).astype(np.float32)
        out = tfm(v, np.random.RandomState(0))
        assert out.shape == (3, 2, 8, 8)


class TestRandAugment:
    def test_clip_consistent_and_shape(self):
        """One op chain per clip: identical frames stay identical after the
        augment (torchvision applies the same sampled ops to the whole
        batched [T, C, H, W] tensor — reference video_dataset.py:342-343)."""
        from video_tokenizer_tpu.data.rand_augment import RandAugmentVideo

        aug = RandAugmentVideo.from_string("2_9_31")
        frame = np.random.RandomState(0).randint(0, 256, (24, 32, 3), np.uint8)
        clip = np.stack([frame] * 4)
        out = aug(clip, np.random.RandomState(1))
        assert out.shape == clip.shape and out.dtype == np.uint8
        for t in range(1, 4):
            assert np.array_equal(out[0], out[t])

    def test_magnitude_zero_identityish_ops(self):
        """magnitude index 0 makes every signed op a no-op, so only
        Posterize(8)/Solarize(255)/AutoContrast/Equalize can change pixels;
        geometry is always preserved."""
        from video_tokenizer_tpu.data.rand_augment import RandAugmentVideo

        aug = RandAugmentVideo(num_ops=2, magnitude=0, num_magnitude_bins=31)
        clip = np.random.RandomState(0).randint(0, 256, (2, 16, 16, 3), np.uint8)
        out = aug(clip, np.random.RandomState(2))
        assert out.shape == clip.shape

    def test_dataset_accepts_rand_augment_knob(self):
        """Golden-shape test through the dataset with the knob on (the
        round-1 build assert-rejected it)."""
        ds = VideoDataset(
            root_path="/tmp", frame_num=4, cls_vid_num="-1_-1",
            crop_size=16, csv_file="null128", split="train",
            rand_augment="2_9_31",
        )
        item = ds[0]
        assert item["gt"].shape == (3, 4, 16, 16)
        assert item["gt"].dtype == np.uint8


class TestCommonUtils:
    def test_repeat_to_m_frames_pads_with_last(self):
        import jax.numpy as jnp
        from video_tokenizer_tpu.utils.common import repeat_to_m_frames

        x = jnp.arange(5, dtype=jnp.float32).reshape(1, 1, 5, 1, 1)
        y = repeat_to_m_frames(x, m=16)
        assert y.shape[2] == 16
        got = np.asarray(y[0, 0, :, 0, 0])
        assert np.array_equal(got[:5], np.arange(5))
        assert np.all(got[5:] == 4.0)  # last frame repeated
        # t >= m passes through untouched
        assert repeat_to_m_frames(x, m=4).shape[2] == 5


class TestRealVideoDecode:
    def test_csv_dataset_decodes_mp4(self, tmp_path):
        """Full real-file path: cv2 decode -> window -> fused transform."""
        import cv2

        rows = ["id,path,action,label"]
        rng = np.random.RandomState(0)
        for i in range(2):
            p = str(tmp_path / f"v_Act{i}_g{i:02d}.mp4")
            w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 48))
            for t in range(12):
                w.write(rng.randint(0, 255, (48, 64, 3), np.uint8))
            w.release()
            rows.append(f"{i},{p},Act{i},{i}")
        (tmp_path / "vids.csv").write_text("\n".join(rows))

        ds = VideoDataset(
            root_path=str(tmp_path), frame_num=8, cls_vid_num="-1_-1",
            crop_size=32, csv_file="vids.csv", split="train",
        )
        assert len(ds) == 2
        item = ds[0]
        assert item["gt"].shape == (3, 8, 32, 32)
        assert item["gt"].dtype == np.uint8
        # non-ucf csv -> label -1 (reference video_dataset.py:229 gates label
        # derivation on the 'ucf' stem)
        assert item["label"] == -1

    def test_use_all_frames_index_cache(self, tmp_path):
        import cv2

        p = str(tmp_path / "v_A_g00.mp4")
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 48))
        rng = np.random.RandomState(0)
        for t in range(20):
            w.write(rng.randint(0, 255, (48, 64, 3), np.uint8))
        w.release()
        (tmp_path / "vids.csv").write_text(f"id,path,action,label\n0,{p},A,0")
        ds = VideoDataset(
            root_path=str(tmp_path), frame_num=8, cls_vid_num="-1_-1",
            crop_size=32, csv_file="vids.csv", split="train",
            use_all_frames=True,
        )
        # 20 frames // 8 = 2 windows
        assert len(ds) == 2
        assert ds[1]["gt"].shape == (3, 8, 32, 32)
        # cache file written and reused
        ds2 = VideoDataset(
            root_path=str(tmp_path), frame_num=8, cls_vid_num="-1_-1",
            crop_size=32, csv_file="vids.csv", split="train",
            use_all_frames=True,
        )
        assert len(ds2) == 2


class TestDatasetKnobs:
    def _mp4(self, tmp_path, name, frames=24):
        import cv2

        p = str(tmp_path / name)
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 25, (64, 48))
        rng = np.random.RandomState(0)
        for _ in range(frames):
            w.write(rng.randint(0, 255, (48, 64, 3), np.uint8))
        w.release()
        return p

    def test_uniform_frame_rate_and_flip(self, tmp_path):
        p = self._mp4(tmp_path, "v_A_g00.mp4")
        (tmp_path / "v.csv").write_text(f"id,path,action,label\n0,{p},A,0")
        ds = VideoDataset(
            root_path=str(tmp_path), frame_num=8, cls_vid_num="-1_-1",
            crop_size=32, csv_file="v.csv", split="train",
            frame_rate="uniform", rand_flip="yes",
        )
        item = ds[0]
        assert item["gt"].shape == (3, 8, 32, 32)

    def test_multi_csv(self, tmp_path):
        pa = self._mp4(tmp_path, "v_A_g00.mp4")
        pb = self._mp4(tmp_path, "v_B_g01.mp4")
        (tmp_path / "a.csv").write_text(f"id,path,action,label\n0,{pa},A,0")
        (tmp_path / "b.csv").write_text(f"id,path,action,label\n0,{pb},B,0")
        ds = VideoDataset(
            root_path=str(tmp_path), frame_num=4, cls_vid_num="-1_-1+-1_-1",
            crop_size=16, csv_file="a.csv+b.csv", split="train",
        )
        assert len(ds) == 2

    def test_js_listing(self, tmp_path):
        import json

        p = self._mp4(tmp_path, "v_A_g00.mp4")
        (tmp_path / "v.js").write_text(json.dumps({"A": [p]}))
        ds = VideoDataset(
            root_path=str(tmp_path), frame_num=4, cls_vid_num="-1_-1",
            crop_size=16, csv_file="v.js", split="train",
        )
        assert len(ds) == 1
        assert ds[0]["gt"].shape == (3, 4, 16, 16)

    def test_short_clip_padded(self, tmp_path):
        p = self._mp4(tmp_path, "v_A_g00.mp4", frames=3)
        (tmp_path / "v.csv").write_text(f"id,path,action,label\n0,{p},A,0")
        ds = VideoDataset(
            root_path=str(tmp_path), frame_num=8, cls_vid_num="-1_-1",
            crop_size=16, csv_file="v.csv", split="train",
        )
        # 3 decoded frames replicate-padded to 8 (reference :347-348)
        assert ds[0]["gt"].shape == (3, 8, 16, 16)
