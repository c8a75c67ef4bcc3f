#!/bin/bash
# VP2 RoboDesk action-conditioned finetune from the OXE-pretrained
# checkpoints (mirror of reference scripts/finetune/vp2-robodesk-64-act-cond.sh).

python train_tokenizer.py \
    --output_dir log_vqgan/vp2_robodesk_tokenizer_ft --seed 0 --mixed_precision bf16 \
    --batch_size 16 --gradient_accumulation_steps 1 --disc_start 1000005 \
    --dataset_name vp2_robodesk --resolution 64 --dataloader_num_workers 16 \
    --random_selection --video_stepsize 1 --segment_horizon 12 \
    --segment_length 8 --context_length 2 \
    --pretrained_model_name_or_path pretrained_models/ivideogpt-oxe-64-act-free/tokenizer \
    --max_train_steps 200005 \
    --dataset_path "{path to preprocessed VP2 robodesk}"

python train_gpt.py \
    --output_dir log_trm/vp2_robodesk_llama_ft --seed 0 --mixed_precision bf16 \
    --pretrained_model_name_or_path log_vqgan/vp2_robodesk_tokenizer_ft \
    --llm_config base --load_internal_llm \
    --action_conditioned --action_dim 5 \
    --pretrained_transformer_path pretrained_models/ivideogpt-oxe-64-act-free/transformer \
    --batch_size 16 --gradient_accumulation_steps 1 \
    --learning_rate 1e-4 --lr_scheduler_type cosine \
    --dataset_name vp2_robodesk --resolution 64 --dataloader_num_workers 16 \
    --dataset_path "{path to preprocessed VP2 robodesk}" \
    --video_stepsize 1 --segment_length 12 --context_length 2 \
    --use_eval_dataset --use_fvd --use_frame_metrics \
    --weight_decay 0.01 --attention_dropout 0.1 --embed_no_wd \
    --max_train_steps 200005
