#!/bin/sh
# Round-5 continuation of the 3v3 shoot run past its mechanical-proof
# budget (4e8, wipes at parity - results/mappo_3v3_shoot/REPORT.md).
# Wipe-event ELO scoring gives the run a live rating channel; budget
# sized to ride whatever TPU time remains after the 2v2 flagship.
python -m neuralplane_tpu.scripts.supervise \
    --run-dir runs/mappo_3v3_shoot_r5 --stall-timeout 600 -- \
    --env-name MultipleCombatShoot \
    --scenario-name multiple_selfplay_shoot_3v3 \
    --algorithm-name mappo --use-selfplay --use-prior \
    --selfplay-algorithm fsp --n-choose-opponents 1 --elo-tie-band 50 \
    --use-eval --eval-interval 10 --eval-stochastic --eval-event-scoring \
    --remat-save-dots \
    --n-rollout-threads 334 --num-env-steps 6e8 \
    --buffer-size 1000 --num-mini-batch 5 --ppo-epoch 16 \
    --lr 3e-4 --gamma 0.99 --entropy-coef 1e-3 --max-grad-norm 2 \
    --data-chunk-length 8 --log-interval 1 --save-interval 20 \
    --model-dir results/mappo_3v3_shoot/policy_checkpoint.pkl
