#!/bin/bash
# BAIR action-conditioned finetune from the OXE-pretrained checkpoints
# (mirror of reference scripts/finetune/bair-64-act-cond.sh).
# Stage 1: finetune the ctx=2-pretrained tokenizer at ctx=1 (the kv
# pos-embs are re-sliced automatically); stage 2: finetune the LM from the
# pretrained OXE transformer (--load_internal_llm: llm subtree only, the
# action head starts fresh) while the tokenizer comes from stage 1's dir.

python train_tokenizer.py \
    --output_dir log_vqgan/bair_tokenizer_ft --seed 0 --mixed_precision bf16 \
    --batch_size 16 --gradient_accumulation_steps 1 --disc_start 1000005 \
    --dataset_name bair --resolution 64 --dataloader_num_workers 16 \
    --random_selection --video_stepsize 1 --segment_horizon 16 \
    --segment_length 8 --context_length 1 \
    --pretrained_model_name_or_path pretrained_models/ivideogpt-oxe-64-act-free/tokenizer \
    --max_train_steps 200005 \
    --dataset_path "{path to preprocessed BAIR}"

python train_gpt.py \
    --output_dir log_trm/bair_llama_ft --seed 0 --mixed_precision bf16 \
    --pretrained_model_name_or_path log_vqgan/bair_tokenizer_ft \
    --llm_config base --load_internal_llm \
    --action_conditioned --action_dim 4 \
    --pretrained_transformer_path pretrained_models/ivideogpt-oxe-64-act-free/transformer \
    --batch_size 16 --gradient_accumulation_steps 1 \
    --learning_rate 1e-4 --lr_scheduler_type cosine \
    --dataset_name bair --resolution 64 --dataloader_num_workers 16 \
    --dataset_path "{path to preprocessed BAIR}" \
    --video_stepsize 1 --segment_length 16 --context_length 1 \
    --use_eval_dataset --use_fvd --use_frame_metrics \
    --weight_decay 0.01 --attention_dropout 0.1 --embed_no_wd \
    --max_train_steps 100005
