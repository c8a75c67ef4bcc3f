#!/bin/bash
# Pre-training on OXE at 64x64 (action-free) on a TPU slice.
# Stage 1: tokenizer; stage 2: transformer.
# Replace {path to preprocessed_OXE} with your npz root
# (datasets/oxe_data_converter.py output).

python train_tokenizer.py \
    --output_dir log_vqgan/oxe-64-act-free --seed 0 --mixed_precision bf16 \
    --learning_rate 5e-4 --disc_learning_rate 5e-4 \
    --batch_size 16 --gradient_accumulation_steps 1 --disc_start 1000005 \
    --dataset_name select --resolution 64 --dataloader_num_workers 16 \
    --random_selection --video_stepsize 1 --segment_horizon 16 \
    --segment_length 8 --context_length 2 \
    --dataset_path "{path to preprocessed_OXE}"

python train_gpt.py \
    --output_dir log_trm/oxe-64-act-free --seed 0 --mixed_precision bf16 \
    --pretrained_model_name_or_path log_vqgan/oxe-64-act-free \
    --llm_config base \
    --batch_size 16 --gradient_accumulation_steps 1 \
    --learning_rate 1e-4 --lr_scheduler_type cosine \
    --dataset_name select --resolution 64 --dataloader_num_workers 16 \
    --dataset_path "{path to preprocessed_OXE}" \
    --video_stepsize 1 --segment_length 16 --context_length 2 \
    --weight_decay 0.01 --attention_dropout 0.1 --embed_no_wd

# Multi-host (replaces the reference's `accelerate launch` over 4 GPUs,
# reference scripts/pretrain/oxe-64-act-free.sh:1): run the SAME commands on
# every host with jax.distributed coordinates, e.g.
#   --coordinator_address host0:8476 --num_processes 4 --process_id $i
# (on Cloud TPU pods the no-flag form auto-detects). batch_size is per
# data-parallel device; the mesh spans all hosts' chips automatically.
