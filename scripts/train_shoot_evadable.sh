#!/bin/sh
# 1v1 EVADABLE-missile self-play: the defensive skill axis of the weapon
# game. vs train_shoot.sh the missile is g_max 5 with a graded proximity
# fuse (pk ramps 1 -> 0 over CPA 100 -> 400 ft), the obs carry the
# incoming missile's bearing/closure so a directed break turn is
# representable, and the reward adds 0.1 * (damage dealt - taken) dense
# shaping plus the Shutdown +-200 kill/death events. Skill here means
# BOTH converting the WEZ into kills and beating incoming shots by
# flying - the axis the 12 g Pk~1 game could never train.
python -m neuralplane_tpu.scripts.supervise \
    --run-dir runs/shoot_evadable --stall-timeout 600 -- \
    --env-name SingleCombatShoot --scenario-name selfplay_shoot_evadable \
    --use-selfplay --use-prior --selfplay-algorithm fsp \
    --n-choose-opponents 1 --elo-tie-band 50 \
    --use-eval --eval-interval 10 --eval-stochastic \
    --n-rollout-threads 1000 --num-env-steps 1e9 \
    --buffer-size 1000 --num-mini-batch 5 --ppo-epoch 16 \
    --lr 3e-4 --gamma 0.99 --entropy-coef 1e-3 --max-grad-norm 2 \
    --data-chunk-length 8 --log-interval 1 --save-interval 20
