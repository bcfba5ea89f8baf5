#!/usr/bin/env bash
# Full SM3 reproduction recipe on TPU (hyperparameters of the reference
# run.sh; batch sizes are GLOBAL and split over the device mesh).
set -e

DATA="./data/7PC"
MEAN="0.7833 0.6712 0.6026"
STD="0.2139 0.2472 0.2571"

####################### stage 1: SSL pre-train ResNet-50
LOG_PATH="./logs/backbone"
python tools/backbone_train.py \
    -a resnet50 --arch-version "v32" --data-name "SevenPCBaseDataset" --data-path "$DATA" \
    --mean $MEAN --std $STD \
    --epochs 400 -b 96 -lr 1e-6 \
    --img-sz 224 224 \
    --num-labels 8 \
    --proj-dim 128 --temperature 0.1 \
    --world-size 2 \
    --log-path "${LOG_PATH}" \
    --proj-name "sm3_r50_backbone" \
    --amp

####################### stage 1b: linear eval of SSL checkpoints
EPOCHS=(49 99 149 199 249 299 349 399)
for epoch in ${EPOCHS[@]}; do
    python tools/backbone_eval.py \
        -a resnet50 --data-name "SevenPCBaseDataset" --data-path "$DATA" \
        --mean $MEAN --std $STD \
        --epochs 50 -b 128 -lr 1e-3 \
        --img-sz 224 224 \
        --num-labels 8 \
        --pretrain-path "${LOG_PATH}/ckp_${epoch}.msgpack" \
        --finetune "fc" \
        --log-path "${LOG_PATH}/test_${epoch}" \
        --proj-name "sm3_r50_backbone_eval" --amp
done

####################### stage 2: MLC DeepCluster training
LOG_PATH="./logs/mlc_train"
python tools/mlc_train.py \
    -a resnet50 --data-name "SevenPCBaseDataset" --data-path "$DATA" \
    --mean $MEAN --std $STD \
    --epochs 150 -b 256 -lr 1e-4 \
    --img-sz 224 224 \
    --num-labels 8 \
    --temperature 1 \
    --mlc-proj "v4" --mlc-proj-dim 512 \
    --num-heads 1 --sa-dim-ff 128 --sa-dropout 0.1 \
    --extractor-proj-dim 128 --extractor-weights "./logs/backbone/ckp_399.msgpack" \
    --log-path "${LOG_PATH}" \
    --proj-name "SM3_MLC_train_v4_r50"

####################### stage 2b: supervised finetune/eval
EPOCHS=(49 99 149)
for epoch in ${EPOCHS[@]}; do
    python tools/mlc_eval.py \
        -a resnet50 --data-name "SevenPCBaseDataset" --data-path "$DATA" \
        --mean $MEAN --std $STD \
        --epochs 100 -b 128 -lr 1e-3 \
        --img-sz 224 224 \
        --num-labels 8 \
        --mlc-proj "v4" --mlc-proj-dim 512 \
        --num-heads 1 --sa-dim-ff 128 --sa-dropout 0.1 \
        --extractor-proj-dim 128 \
        --pretrain-path "${LOG_PATH}/ckp_${epoch}.msgpack" \
        --finetune "projector" \
        --log-path "${LOG_PATH}/test_${epoch}" \
        --proj-name "SM3_MLC_eval_v4_r50"
done
