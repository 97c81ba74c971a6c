#!/bin/sh
# 2v2 team missile combat with the EVADABLE missile: the defensive skill
# axis (graded CPA proximity fuse + per-agent threat bearing obs,
# multiple_selfplay_shoot_evadable.yaml) under MAPPO - the capstone game
# combining the team machinery (round 2), the weapon layer (round 3) and
# the evadable-missile design (round 4, results/shoot_evadable).
python -m neuralplane_tpu.scripts.supervise \
    --run-dir runs/mappo_2v2_evadable --stall-timeout 600 -- \
    --env-name MultipleCombatShoot \
    --scenario-name multiple_selfplay_shoot_evadable \
    --algorithm-name mappo --use-selfplay --use-prior \
    --selfplay-algorithm fsp --n-choose-opponents 1 --elo-tie-band 50 \
    --use-eval --eval-interval 10 --eval-stochastic \
    --n-rollout-threads 500 --num-env-steps 1e9 \
    --buffer-size 1000 --num-mini-batch 5 --ppo-epoch 16 \
    --lr 3e-4 --gamma 0.99 --entropy-coef 1e-3 --max-grad-norm 2 \
    --data-chunk-length 8 --log-interval 1 --save-interval 20
