#!/bin/sh
# Control (posture) task (parity: reference scripts/train_control.sh)
python -m neuralplane_tpu.scripts.train \
    --env-name Control --scenario-name control --model-name F16 \
    --algorithm-name ppo --experiment-name v1 --seed 1 \
    --n-rollout-threads 3000 --num-env-steps 2.25e9 \
    --buffer-size 3000 --num-mini-batch 5 --ppo-epoch 16 \
    --lr 3e-4 --gamma 0.99 --entropy-coef 1e-3 --max-grad-norm 2 \
    --data-chunk-length 8 --log-interval 1 --save-interval 1
