#!/bin/sh
# 1v1 self-play combat
python -m neuralplane_tpu.scripts.train \
    --env-name SingleCombat --scenario-name selfplay --use-selfplay \
    --selfplay-algorithm fsp --n-choose-opponents 1 --elo-tie-band 1.0 \
    --use-eval --eval-interval 10 \
    --n-rollout-threads 1000 --num-env-steps 1e9 \
    --buffer-size 1000 --num-mini-batch 5 --ppo-epoch 16 \
    --lr 3e-4 --gamma 0.99 --entropy-coef 1e-3 --max-grad-norm 2 \
    --min-log-std -2.3 \
    --data-chunk-length 8 --log-interval 1 --save-interval 1
