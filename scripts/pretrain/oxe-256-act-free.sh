#!/bin/bash
# 256x256 tokenizer (310M) + transformer; disc starts at 250k.
python train_tokenizer.py \
    --output_dir log_vqgan/oxe-256-act-free --seed 0 --mixed_precision bf16 \
    --learning_rate 5e-4 --disc_learning_rate 5e-4 \
    --batch_size 2 --gradient_accumulation_steps 4 --disc_start 250000 \
    --dataset_name select --resolution 256 --dataloader_num_workers 16 \
    --random_selection --video_stepsize 1 --segment_horizon 16 \
    --segment_length 8 --context_length 2 \
    --dataset_path "{path to preprocessed_OXE}"

python train_gpt.py \
    --output_dir log_trm/oxe-256-act-free --seed 0 --mixed_precision bf16 \
    --pretrained_model_name_or_path log_vqgan/oxe-256-act-free \
    --llm_config base \
    --batch_size 4 --learning_rate 1e-4 --lr_scheduler_type cosine \
    --dataset_name select --resolution 256 --dataloader_num_workers 16 \
    --dataset_path "{path to preprocessed_OXE}" \
    --video_stepsize 1 --segment_length 16 --context_length 2 \
    --weight_decay 0.01 --attention_dropout 0.1 --embed_no_wd
