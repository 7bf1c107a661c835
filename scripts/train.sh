#!/bin/bash
# Ref-NeRF launch with ray-num/dataset args
# (parity with /root/reference/train.sh:13).
# usage: scripts/train.sh <sample_ray_num> <dataset_name> [extra flags...]
RAYS=${1:-1024}
DATASET=${2:-lego}
shift 2 2>/dev/null
python train.py -t -s -w --sample_ray_num "$RAYS" --dataset_name "$DATASET" \
    --center_crop_iter 500 --center_crop_x 0.5 --center_crop_y 0.5 "$@"
