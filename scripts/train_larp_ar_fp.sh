#!/bin/bash
# LARP AR prior, frame prediction on K600, single-host recipe
# (reference scripts/train_larp_ar_fp.sh). One process drives all local chips.

python3 train.py --cfg cfgs/larp_ar_fp.yaml \
    --manualSeed 66667 --tag single_host \
    --csv_file k600_train.csv --out_path save/larp_ar_fp/ \
    --name larp_ar_fp -b 4 -j 4 \
    --frame_num 16 --input_size 128 \
    --opts \
    test_dataset.csv_paths.k600_val k600_val.csv \
    model.name llama-abs-LP \
    vae.name larp_tokenizer \
    vae.checkpoint save/larp_tokenizer/larp_tokenizer_single_host/epoch-final \
    ar.num_cond_frames 5 \
    ar.num_samples 128 \
    optimizer.name adamw \
    optimizer.args.weight_decay 0.05 \
    optimizer.warmup_epoch 1 \
    optimizer.args.lr 0.0006 \
    use_amp true \
    vis_epoch 1 eval_epoch 1 max_epoch 75 latest_interval 1

# append --replace to start fresh instead of resuming from the latest checkpoint
