#!/bin/bash
# Reproduce the LARP tokenizer recipe (reference scripts/train_larp_tokenizer_reproduce.sh)
# on TPU: one process per host drives all local chips (no mp.spawn). -b is the
# GLOBAL batch in both frameworks (the reference divides by tot_gpus,
# base_trainer.py:316; here it shards over the data mesh axis).
# NOTE: the fork's copy of this script claims to reproduce
# hywang66/LARP-L-long-tokenizer but overrides the model to d=512/depth-6 at
# input 256 (its own experiment). This script keeps the actual LARP-L-long
# flagship geometry (cfgs/larp_tokenizer.yaml defaults) that the claim, the
# eval golden numbers, and BASELINE.md refer to.

python3 train.py --cfg cfgs/larp_tokenizer.yaml \
    --manualSeed 66667 --tag default \
    --csv_file ucf101_train.csv --out_path save/larp_tokenizer/ \
    --name larp_tokenizer -b 8 -j 8 \
    --frame_num 16 --input_size 128 \
    --opts \
    test_dataset.csv_paths.ucf101_val ucf101_val.csv \
    model.args.bottleneck_token_num 1024 \
    model.args.bottleneck.args.regularizer.name vq \
    optimizer.args.lr 0.0001 \
    optimizer.loss_args.lr 0.00003 \
    optimizer.warmup_epoch 8 \
    optimizer.min_lr_mult 0.01 \
    optimizer.lr_type cosine \
    use_amp true \
    vis_epoch 10 eval_epoch 5 max_epoch 150 latest_interval 10 save_best true
