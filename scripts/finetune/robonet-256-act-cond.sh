#!/bin/bash
# RoboNet 256px action-conditioned finetune from the OXE-256-pretrained
# checkpoints (mirror of reference scripts/finetune/robonet-256-act-cond.sh).
# 256px geometry: 310M tokenizer (blocks [128,256,256,512,768],
# max_att_resolution 32) — pass the 256px config via the checkpoint's
# config.json; --no_aug matches the reference recipe.

python train_tokenizer.py \
    --output_dir log_vqgan/robonet256_tokenizer_ft --seed 0 --mixed_precision bf16 \
    --batch_size 2 --gradient_accumulation_steps 4 --disc_start 1000005 \
    --dataset_name tfds_robonet --resolution 256 --dataloader_num_workers 16 \
    --random_selection --video_stepsize 1 --segment_horizon 12 \
    --segment_length 8 --context_length 2 --no_aug \
    --pretrained_model_name_or_path pretrained_models/ivideogpt-oxe-256-act-free/tokenizer \
    --max_train_steps 200005 \
    --dataset_path "{path to preprocessed RoboNet}"

python train_gpt.py \
    --output_dir log_trm/robonet256_llama_ft --seed 0 --mixed_precision bf16 \
    --pretrained_model_name_or_path log_vqgan/robonet256_tokenizer_ft \
    --llm_config base --load_internal_llm \
    --action_conditioned --action_dim 5 \
    --pretrained_transformer_path pretrained_models/ivideogpt-oxe-256-act-free/transformer \
    --batch_size 4 --gradient_accumulation_steps 2 \
    --learning_rate 1e-4 --lr_scheduler_type cosine \
    --dataset_name tfds_robonet --resolution 256 --dataloader_num_workers 16 \
    --dataset_path "{path to preprocessed RoboNet}" \
    --video_stepsize 1 --segment_length 12 --context_length 2 \
    --use_eval_dataset --use_fvd --use_frame_metrics \
    --weight_decay 0.01 --attention_dropout 0.1 --embed_no_wd \
    --max_train_steps 600005
