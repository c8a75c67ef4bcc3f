#!/bin/bash
# Stage-2 transformer pretrain with the 436M "medium" LLaMA.
python train_gpt.py \
    --output_dir log_trm/oxe-64-act-free-medium --seed 0 --mixed_precision bf16 \
    --pretrained_model_name_or_path log_vqgan/oxe-64-act-free \
    --llm_config medium \
    --batch_size 16 --learning_rate 1e-4 --lr_scheduler_type cosine \
    --dataset_name select --resolution 64 --dataloader_num_workers 16 \
    --dataset_path "{path to preprocessed_OXE}" \
    --video_stepsize 1 --segment_length 16 --context_length 2 \
    --weight_decay 0.01 --attention_dropout 0.1 --embed_no_wd

# The 436M medium LM can shard its projections with --n_model 2 (or 4);
# "data" then spans the remaining chips (see ivideogpt_tpu/parallel/mesh.py).
