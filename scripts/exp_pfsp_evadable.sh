#!/bin/sh
# PFSP A/B on a game with a REAL skill axis: results/mappo_2v2_shoot_pfsp
# found PFSP useless on the kill-parity 12g team game and recommended
# re-testing on the evadable game, whose graded Pk keeps a monotone
# skill gradient (results/shoot_evadable: 50.9:1 ladder). Both legs
# resume the SAME evadable-1v1 final (+its pool) for +3e8 steps; the only
# difference is the opponent-sampling algorithm. Compare with
# ladder_probe --both-sides: each final vs the common start, and the two
# finals head-to-head.
set -e
COMMON="--env-name SingleCombatShoot --scenario-name selfplay_shoot_evadable \
    --use-selfplay --use-prior \
    --n-choose-opponents 1 --elo-tie-band 50 \
    --use-eval --eval-interval 10 --eval-stochastic \
    --n-rollout-threads 1000 --num-env-steps 3e8 \
    --buffer-size 1000 --num-mini-batch 5 --ppo-epoch 16 \
    --lr 3e-4 --gamma 0.99 --entropy-coef 1e-3 --max-grad-norm 2 \
    --data-chunk-length 8 --log-interval 1 --save-interval 20 \
    --model-dir runs/shoot_evadable/leg_2/checkpoints/state_latest.pkl"

python -m neuralplane_tpu.scripts.supervise \
    --run-dir runs/evadable_cont_fsp --stall-timeout 600 -- $COMMON \
    --selfplay-algorithm fsp

python -m neuralplane_tpu.scripts.supervise \
    --run-dir runs/evadable_cont_pfsp --stall-timeout 600 -- $COMMON \
    --selfplay-algorithm pfsp
