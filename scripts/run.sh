#!/bin/bash
# Canonical command lines for the three trainers + spherical rendering
# (parity with /root/reference/run.sh:1-9). Pick one and run it.

# single chip, vanilla NeRF, bf16, white background
# python train.py -s -w --dataset_root ./data --dataset_name lego

# single chip, Ref-NeRF
# python train.py -t -s -w --dataset_root ./data --dataset_name helmet

# data-parallel over all local devices (grad pmean over the 'data' mesh axis)
# python ddp_train.py -s -w --dataset_root ./data --dataset_name lego

# model averaging: 4 replicas, average every 10 epochs, spatially divided views
# python model_average.py -s -w -div --ma_epoch 10 --ma_method all_reduce \
#     --dataset_root ./data --dataset_name lego

# render a 120-pose spherical orbit from the trained model
# python train.py -r -s -w --dataset_root ./data --dataset_name lego

# evaluate PSNR on the test poses
# python train.py -r -e -s -w --dataset_root ./data --dataset_name lego
echo "open scripts/run.sh and pick a command line"
