#!/bin/sh
# 2v2 team missile combat: MAPPO + ShootTuple head + Beta launch prior.
# Missiles give a much sharper credit signal than gun posture (a kill at
# range = -100 victim blood -> team-wipe +-200), so the team ladder moves
# on budgets where the guns-only 2v2 was still flat (results/mappo_2v2).
python -m neuralplane_tpu.scripts.supervise \
    --run-dir runs/mappo_2v2_shoot --stall-timeout 600 -- \
    --env-name MultipleCombatShoot --scenario-name multiple_selfplay_shoot \
    --algorithm-name mappo --use-selfplay --use-prior \
    --selfplay-algorithm fsp --n-choose-opponents 1 --elo-tie-band 50 \
    --use-eval --eval-interval 10 --eval-stochastic \
    --n-rollout-threads 500 --num-env-steps 1e9 \
    --buffer-size 1000 --num-mini-batch 5 --ppo-epoch 16 \
    --lr 3e-4 --gamma 0.99 --entropy-coef 1e-3 --max-grad-norm 2 \
    --data-chunk-length 8 --log-interval 1 --save-interval 20
