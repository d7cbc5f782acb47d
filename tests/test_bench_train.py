"""Pin bench.py's training-step benchmark paths on tiny CPU geometries.

The driver runs bench.py on TPU between sessions; these tests keep the
train-bench code paths from bitrotting (the round-2 lesson: driver-run code
with no CPU test breaks silently)."""
import bench


class TestTrainBench:
    def test_bench_train_tokenizer_tiny(self, tmp_path):
        tiny = {
            "train_dataset": {
                "name": "video_dataset",
                "args": {
                    "root_path": "/tmp", "split": "train", "frame_num": 8,
                    "csv_file": "null128", "crop_size": 32,
                    "cls_vid_num": "-1_-1",
                },
                "loader": {"batch_size": 8, "num_workers": 0},
            },
            "model": {
                "name": "larp_tokenizer",
                "args": {
                    "bottleneck": {
                        "name": "bottleneck",
                        "args": {
                            "bottleneck_dim": 8, "norm": "none",
                            "regularizer": {
                                "name": "vq",
                                "args": {"codebook_size": 64,
                                         "l2_normalized": True,
                                         "stochastic": True,
                                         "stochastic_temperature": 0.03},
                            },
                        },
                    },
                    "prior_model": {"name": "none"},
                    "bottleneck_token_num": 16, "bottleneck_type": "vq",
                    "input_size": 32, "frame_num": 8,
                    "temporal_patch_size": 4, "patch_size": 8,
                    "decoder_temporal_patch_size": 4, "decoder_patch_size": 8,
                    "encoder_hidden_size": 64, "decoder_hidden_size": 64,
                    "encoder_num_heads": 4, "decoder_num_heads": 4,
                    "encoder_depth": 1, "decoder_depth": 1,
                },
            },
            "loss": {
                "name": "lpips_disc_loss",
                "args": {
                    "disc_start": 0, "disc_loss": "hinge",
                    "disc_weight": 0.3, "d_update_freq": 1,
                    "disc_tran_hidden_size": 64, "disc_tran_n_heads": 4,
                    "disc_tran_n_layers": 1,
                    "disc_tran_temporal_patch_size": 4,
                    "disc_tran_patch_size": 8, "input_spatial_size": 32,
                    "frame_num": 8,
                },
            },
            "use_amp": False,
        }
        # batch 8: divisible by the 8-device CPU test mesh
        clips_s = bench.bench_train_tokenizer(batch_size=8, steps=2,
                                              cfg_override=tiny)
        assert clips_s > 0

    def test_bench_train_ar_tiny(self):
        tok_s = bench.bench_train_ar(
            batch_size=2, steps=2,
            model_kw=dict(n_layer=2, n_head=2, dim=64, vocab_size=32,
                          max_seq_len=16),
        )
        assert tok_s > 0

    def test_train_flops_analytic_sane(self):
        """The analytic GAN-step FLOP count must dominate 3x the fwd count
        (G fwd+bwd) and stay within a sane envelope of it (disc + LPIPS are
        a fraction of the 24-layer ViT)."""
        f = bench.tokenizer_flops_per_clip()
        g = bench.gan_train_flops_per_clip()
        assert g > 3 * f
        assert g < 6 * f
        # AR: 6 FLOPs/param/token dominates; attention adds a few percent
        per_tok = bench.ar_train_flops_per_token()
        n_params = 30 * (4 * 1280 ** 2 + 3 * 1280 * 3456) + 1280 * 8192
        assert per_tok > 6 * n_params
        assert per_tok < 8 * n_params
