#!/bin/sh
# Round-5 continuation of the 1v1 evadable flagship: the round-4 PFSP A/B
# showed BOTH +3e8 continuations beat the 1e9 "final" 1.5-1.8:1 - the
# skill ceiling is unmined. Continue the strongest checkpoint (1.3e9,
# runs/evadable_cont_fsp = results/evadable_pfsp_ab/fsp_final_checkpoint)
# under FSP toward ~2e9 total. --remat-save-dots = round-5 fast PPO
# update; event scoring is a team-game feature, the 1v1 banded ladder is
# already alive (1000 -> 1580 by 1.3e9).
python -m neuralplane_tpu.scripts.supervise \
    --run-dir runs/shoot_evadable_r5 --stall-timeout 600 -- \
    --env-name SingleCombatShoot --scenario-name selfplay_shoot_evadable \
    --use-selfplay --use-prior --selfplay-algorithm fsp \
    --n-choose-opponents 1 --elo-tie-band 50 \
    --use-eval --eval-interval 10 --eval-stochastic \
    --remat-save-dots \
    --n-rollout-threads 1000 --num-env-steps 7e8 \
    --buffer-size 1000 --num-mini-batch 5 --ppo-epoch 16 \
    --lr 3e-4 --gamma 0.99 --entropy-coef 1e-3 --max-grad-norm 2 \
    --data-chunk-length 8 --log-interval 1 --save-interval 20 \
    --model-dir results/evadable_pfsp_ab/fsp_final_checkpoint.pkl
