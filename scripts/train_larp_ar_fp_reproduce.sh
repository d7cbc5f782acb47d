#!/bin/bash
# Frame-prediction AR prior on K600 (reference scripts/train_larp_ar_fp_reproduce.sh).

python3 train.py --cfg cfgs/larp_ar_fp.yaml \
    --manualSeed 66667 --tag default \
    --csv_file k600_train.csv --out_path save/larp_ar_fp/ \
    --name larp_ar_fp -b 64 -j 32 \
    --frame_num 16 --input_size 128 \
    --opts \
    test_dataset.csv_paths.k600_val k600_val.csv \
    model.name llama-abs-LP \
    vae.checkpoint save/larp_tokenizer/larp_tokenizer_default/epoch-last \
    ar.num_cond_frames 5 \
    optimizer.name adamw \
    optimizer.args.weight_decay 0.05 \
    optimizer.args.lr 0.0006 \
    use_amp true \
    vis_epoch 15 eval_epoch 15 max_epoch 75 latest_interval 15
