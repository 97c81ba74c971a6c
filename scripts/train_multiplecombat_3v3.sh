#!/bin/sh
# 3v3 team missile combat: the nvn machinery at a second team size
# (configs/multiple_selfplay_shoot_3v3.yaml, obs 44+3, [E,6,6] all-pairs
# geometry). Shorter budget than the 2v2 flagship runs - the goal is a
# documented 3v3 training artifact with a ladder probe, not a new
# flagship (2v2 lesson: team games need long budgets for ladder movement).
python -m neuralplane_tpu.scripts.supervise \
    --run-dir runs/mappo_3v3_shoot --stall-timeout 600 -- \
    --env-name MultipleCombatShoot \
    --scenario-name multiple_selfplay_shoot_3v3 \
    --algorithm-name mappo --use-selfplay --use-prior \
    --selfplay-algorithm fsp --n-choose-opponents 1 --elo-tie-band 50 \
    --use-eval --eval-interval 10 --eval-stochastic \
    --n-rollout-threads 334 --num-env-steps 4e8 \
    --buffer-size 1000 --num-mini-batch 5 --ppo-epoch 16 \
    --lr 3e-4 --gamma 0.99 --entropy-coef 1e-3 --max-grad-norm 2 \
    --data-chunk-length 8 --log-interval 1 --save-interval 20
