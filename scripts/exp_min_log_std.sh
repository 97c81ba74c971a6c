#!/bin/sh
# Validation experiment for --min-log-std (algorithms/rl_config.py:55-59):
# the round-2 mappo_2v2 run collapsed its Gaussian (entropy -49, sigma
# ~1e-6 by 1.5e9 steps) and its late-run ladder movement died. This pair
# reproduces collapse PRESSURE cheaply (entropy-coef 1e-4 instead of 1e-3
# accelerates the collapse) on the same 2v2 gun game, 3e8 steps each:
#   - control: no floor -> expect log_std to dive;
#   - floored: --min-log-std -2.3 (sigma >= ~0.1) -> entropy bounded.
# Afterwards compare (a) policy_entropy_loss curves, (b) each final vs its
# own rung 0 (ladder probe), (c) floored final vs control final
# head-to-head. Results: results/min_log_std/REPORT.md.
set -e
COMMON="--env-name MultipleCombat --scenario-name multiple_selfplay \
    --algorithm-name mappo --use-selfplay --selfplay-algorithm fsp \
    --n-choose-opponents 1 --elo-tie-band 50 \
    --use-eval --eval-interval 10 --eval-stochastic \
    --n-rollout-threads 500 --num-env-steps 3e8 \
    --buffer-size 1000 --num-mini-batch 5 --ppo-epoch 16 \
    --lr 3e-4 --gamma 0.99 --entropy-coef 1e-4 --max-grad-norm 2 \
    --data-chunk-length 8 --log-interval 1 --save-interval 20"

python -m neuralplane_tpu.scripts.supervise \
    --run-dir runs/mls_control --stall-timeout 600 -- $COMMON

python -m neuralplane_tpu.scripts.supervise \
    --run-dir runs/mls_floored --stall-timeout 600 -- $COMMON \
    --min-log-std -2.3
