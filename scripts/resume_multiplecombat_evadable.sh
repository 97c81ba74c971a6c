#!/bin/sh
# Round-5 continuation of the 2v2 team-evadable flagship: resume the 1e9
# checkpoint (runs/mappo_2v2_evadable) and train to the budget-curve
# threshold (gun 2v2 was decisive at 2.2e9; evadable kills are ~2x rarer).
# New this round: wipe-event ELO scoring (the banded protocol left
# latest_elo at init through the whole first 1e9 - results/
# mappo_2v2_evadable/REPORT.md) and the faster PPO update
# (--remat-save-dots + the round-5 trainer/env optimizations).
# Resume source: the committed actor-only results checkpoint (the round-4
# runs/ tree did not survive the VM; Runner.restore grafts an actor-only
# pkl onto a fresh critic/optimizer and the pool reseeds from it).
python -m neuralplane_tpu.scripts.supervise \
    --run-dir runs/mappo_2v2_evadable_r5 --stall-timeout 600 -- \
    --env-name MultipleCombatShoot \
    --scenario-name multiple_selfplay_shoot_evadable \
    --algorithm-name mappo --use-selfplay --use-prior \
    --selfplay-algorithm fsp --n-choose-opponents 1 --elo-tie-band 50 \
    --use-eval --eval-interval 10 --eval-stochastic --eval-event-scoring \
    --remat-save-dots \
    --n-rollout-threads 500 --num-env-steps 1.5e9 \
    --buffer-size 1000 --num-mini-batch 5 --ppo-epoch 16 \
    --lr 3e-4 --gamma 0.99 --entropy-coef 1e-3 --max-grad-norm 2 \
    --data-chunk-length 8 --log-interval 1 --save-interval 20 \
    --model-dir results/mappo_2v2_evadable/policy_checkpoint.pkl
