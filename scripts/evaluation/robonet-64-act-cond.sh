#!/bin/bash
python train_gpt.py \
    --output_dir log_eval/robonet-64-act-cond --seed 0 --mixed_precision bf16 \
    --pretrained_model_name_or_path pretrained_models/ivideogpt-robonet-64-act-cond \
    --llm_config base \
    --dataset_name tfds_robonet --resolution 64 \
    --video_stepsize 1 --segment_length 12 --context_length 2 \
    --use_fvd --use_frame_metrics \
    --eval_only --eval_generate_times 100 --eval_max_batchsize 80 \
    --action_conditioned --action_dim 5 \
    --i3d_weights pretrained_models/i3d_torch.pt \
    --lpips_weights pretrained_models/vgg16_torch.pth
