#!/bin/bash
# LARP AR prior, class-conditional, single-host recipe
# (reference scripts/train_larp_ar.sh). One process drives all local chips.

python3 train.py --cfg cfgs/larp_ar.yaml \
    --manualSeed 66667 --tag single_host \
    --csv_file ucf101_train.csv --out_path save/larp_ar/ \
    --name larp_ar -b 4 -j 4 \
    --frame_num 16 --input_size 128 \
    --opts \
    test_dataset.csv_paths.ucf101_val ucf101_val.csv \
    model.name llama-abs-LP \
    vae.name larp_tokenizer \
    vae.checkpoint save/larp_tokenizer/larp_tokenizer_single_host/epoch-final \
    ar.num_samples 32 \
    optimizer.name adamw \
    optimizer.args.weight_decay 0.05 \
    optimizer.warmup_epoch 4 \
    optimizer.args.lr 0.0006 \
    use_amp true \
    vis_epoch 30 eval_epoch 30 max_epoch 3000 latest_interval 30

# append --replace to start fresh instead of resuming from the latest checkpoint
