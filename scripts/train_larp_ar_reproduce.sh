#!/bin/bash
# Reproduce the 632M class-conditional AR prior recipe
# (reference scripts/train_larp_ar_reproduce.sh) on TPU.

python3 train.py --cfg cfgs/larp_ar.yaml \
    --manualSeed 66667 --tag default \
    --csv_file ucf101_train.csv --out_path save/larp_ar/ \
    --name larp_ar -b 64 -j 32 \
    --frame_num 16 --input_size 128 \
    --opts \
    test_dataset.csv_paths.ucf101_val ucf101_val.csv \
    model.name llama-abs-LP \
    vae.checkpoint save/larp_tokenizer/larp_tokenizer_default/epoch-last \
    ar.num_samples 32 \
    optimizer.name adamw \
    optimizer.args.weight_decay 0.05 \
    optimizer.warmup_epoch 4 \
    optimizer.args.lr 0.0006 \
    use_amp true \
    vis_epoch 30 eval_epoch 30 max_epoch 3000 latest_interval 30
