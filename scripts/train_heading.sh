#!/bin/sh
# Heading task (parity: reference scripts/train_heading.sh)
env="Control"
scenario="heading"
model="F16"
algo="ppo"
exp="v1"
seed=1

python -m neuralplane_tpu.scripts.train \
    --env-name ${env} --scenario-name ${scenario} --model-name ${model} \
    --algorithm-name ${algo} --experiment-name ${exp} --seed ${seed} \
    --n-rollout-threads 3000 --num-env-steps 1.35e9 \
    --buffer-size 3000 --num-mini-batch 5 --ppo-epoch 16 \
    --lr 3e-4 --gamma 0.99 --entropy-coef 1e-3 --max-grad-norm 2 \
    --data-chunk-length 8 --log-interval 1 --save-interval 1
