#!/bin/sh
# 1v1 missile-combat self-play: the ShootTuple head + Beta launch prior on
# the env that exposes them (envs/combat_shoot.py). Hyperparameters follow
# the reference selfplay recipe (scripts/train_selfplay.sh); the tie band
# is on the kill scale (Shutdown +-200 events decide matches, not the
# posture shaping whose episode averages stay ~O(1)); eval is stochastic
# so the in-training ladder reflects behavior, not collapsed modes.
python -m neuralplane_tpu.scripts.supervise \
    --run-dir runs/shoot_1v1 --stall-timeout 600 -- \
    --env-name SingleCombatShoot --scenario-name selfplay_shoot \
    --use-selfplay --use-prior --selfplay-algorithm fsp \
    --n-choose-opponents 1 --elo-tie-band 50 \
    --use-eval --eval-interval 10 --eval-stochastic \
    --n-rollout-threads 1000 --num-env-steps 1e9 \
    --buffer-size 1000 --num-mini-batch 5 --ppo-epoch 16 \
    --lr 3e-4 --gamma 0.99 --entropy-coef 1e-3 --max-grad-norm 2 \
    --data-chunk-length 8 --log-interval 1 --save-interval 20
