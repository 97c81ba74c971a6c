#!/bin/sh
# Tracking task on the hierarchical Planning env (parity: scripts/train_tracking.sh)
python -m neuralplane_tpu.scripts.train \
    --env-name Planning --scenario-name tracking --model-name F16 \
    --algorithm-name ppo --experiment-name v1 --seed 1 \
    --n-rollout-threads 10000 --num-env-steps 3e8 \
    --buffer-size 100 --num-mini-batch 5 --ppo-epoch 16 \
    --lr 3e-4 --gamma 0.99 --entropy-coef 1e-3 --max-grad-norm 2 \
    --data-chunk-length 10 --log-interval 1 --save-interval 1
