#!/bin/bash
# Goal-conditioned pretrain: rand_shuffle tokenizer segments; goal frame
# first in the GPT stage (segment_length 17 = goal + 16).
python train_tokenizer.py \
    --output_dir log_vqgan/oxe-64-goal-cond --seed 0 --mixed_precision bf16 \
    --learning_rate 1e-4 --disc_learning_rate 1e-4 \
    --batch_size 16 --disc_start 1000005 \
    --dataset_name select --resolution 64 --dataloader_num_workers 16 \
    --random_shuffle --video_stepsize 1 --segment_horizon 16 \
    --segment_length 8 --context_length 2 \
    --dataset_path "{path to preprocessed_OXE}" \
    --pretrained_model_name_or_path log_vqgan/oxe-64-act-free/tokenizer

python train_gpt.py \
    --output_dir log_trm/oxe-64-goal-cond --seed 0 --mixed_precision bf16 \
    --pretrained_model_name_or_path log_vqgan/oxe-64-goal-cond \
    --llm_config base \
    --batch_size 16 --learning_rate 1e-4 --lr_scheduler_type cosine \
    --dataset_name select --resolution 64 --dataloader_num_workers 16 \
    --dataset_path "{path to preprocessed_OXE}" \
    --goal_conditioned --video_stepsize 1 --segment_length 17 --context_length 2 \
    --weight_decay 0.01 --attention_dropout 0.1 --embed_no_wd
