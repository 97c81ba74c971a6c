#!/bin/sh
# Cessna-172P heading task with GA-scale RANDOM target increments
# (configs/heading_c172p.yaml). Two 4e8 legs reach ~76% deterministic
# goal success (results/c172p_heading/REPORT.md); resume the second leg
# with --model-dir <run>/checkpoints/state_latest.pkl.
python -m neuralplane_tpu.scripts.train \
    --env-name Control --scenario-name heading_c172p --model-name C172P \
    --n-rollout-threads 3000 --num-env-steps 4e8 \
    --buffer-size 3000 --num-mini-batch 5 --ppo-epoch 16 \
    --lr 3e-4 --gamma 0.99 --entropy-coef 1e-3 --max-grad-norm 2 \
    --data-chunk-length 8 --log-interval 1 --save-interval 10
