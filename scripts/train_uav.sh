#!/bin/sh
# UAV point-mass model on the tracking task (direct body-force control).
# The reference ships UAVModel but never trains it (its tracking script
# uses the hierarchical PlanningEnv on the F-16); see
# results/uav_tracking/REPORT.md for the model's design ceiling.
python -m neuralplane_tpu.scripts.train \
    --env-name Control --scenario-name tracking --model-name UAV \
    --n-rollout-threads 1000 --num-env-steps 2e8 \
    --buffer-size 3000 --num-mini-batch 5 --ppo-epoch 16 \
    --lr 3e-4 --gamma 0.99 --entropy-coef 1e-3 --max-grad-norm 2 \
    --data-chunk-length 8 --log-interval 1 --save-interval 10
