#!/bin/bash
# BAIR action-conditioned eval: seg 16 ctx 1, 100 samples/clip, FVD + frame
# metrics (best-of-t). Needs DATASET.yaml pointing at the BAIR npz splits
# and converted I3D/LPIPS weight files for absolute numbers.
python train_gpt.py \
    --output_dir log_eval/bair-64-act-cond --seed 0 --mixed_precision bf16 \
    --pretrained_model_name_or_path pretrained_models/ivideogpt-bair-64-act-cond \
    --llm_config base \
    --dataset_name bair --resolution 64 \
    --video_stepsize 1 --segment_length 16 --context_length 1 \
    --use_fvd --use_frame_metrics \
    --eval_only --eval_generate_times 100 --eval_max_batchsize 80 \
    --action_conditioned --action_dim 4 \
    --i3d_weights pretrained_models/i3d_torch.pt \
    --lpips_weights pretrained_models/vgg16_torch.pth
