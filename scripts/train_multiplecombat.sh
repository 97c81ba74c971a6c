#!/bin/sh
# 2v2 multi-agent combat with MAPPO (centralized critic) self-play.
# The reference ships `--algorithm-name mappo` as a no-op string
# (SURVEY.md A4m: runners hardcode algorithms.ppo); here it selects the
# MAPPOSelfplayRunner + SharedReplayBuffer semantics for real, on the
# team-game MultipleCombatEnv (team obs, nearest-threat damage, per-agent
# death, +-200 team-wipe events).
# elo-tie-band 50: posture-only episodes (sub-1 reward diffs) tie; kill
# episodes (+-200 events) decide matches.
python -m neuralplane_tpu.scripts.train \
    --env-name MultipleCombat --scenario-name multiple_selfplay \
    --algorithm-name mappo --use-selfplay \
    --selfplay-algorithm fsp --n-choose-opponents 1 --elo-tie-band 50.0 \
    --use-eval --eval-interval 10 --n-eval-rollout-threads 100 \
    --n-rollout-threads 500 --num-env-steps 3e9 \
    --buffer-size 1000 --num-mini-batch 5 --ppo-epoch 16 \
    --lr 3e-4 --gamma 0.99 --entropy-coef 1e-3 --max-grad-norm 2 \
    --min-log-std -2.3 \
    --data-chunk-length 8 --log-interval 1 --save-interval 1 "$@"
