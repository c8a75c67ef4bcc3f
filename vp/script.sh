#!/usr/bin/env bash
# VP2 benchmark launch commands (mirrors reference vp/script.sh).
# Requires the VP2 harness (https://github.com/s-tian/vp2) with
# vp/ivideogpt.yaml installed as a model config and ivideogpt_tpu on
# PYTHONPATH. Point the checkpoint paths at exported safetensors dirs
# (train_tokenizer.py / train_gpt.py write them under output_dir/).

CKPT=${CKPT:-/path/to/pretrained_models}

# robosuite tasks
python scripts/run_control.py --multirun hydra.job.name=rs_case_study \
    model=ivideogpt model_name=rs5k_full_ivideogpt \
    planning_modalities=[rgb] agent/optimizer/objective=mse_rgb \
    seed=1,2,3,4 agent.optimizer.log_every=5 sweep=single_task_epoch \
    model.pretrained_transformer_path=$CKPT/vp2_robosuite/transformer \
    model.pretrained_vqgan_name_or_path=$CKPT/vp2_robosuite/tokenizer \
    model.config_name=$CKPT/vp2_robosuite/transformer/config.json \
    model.action_dim=4

# robodesk tasks (one line per task; push_red shown, repeat for
# push_blue/push_green/upright_block_off_table/flat_block_off_table/
# open_slide/open_drawer as in the reference)
python scripts/run_control.py --multirun hydra.job.name=rd_case_study \
    planning_modalities=[rgb] seed=1,2,3,4 agent.replan_interval=1 \
    env=robodesk sweep=multi_task_epoch \
    agent.optimizer.init_std=[0.5,0.5,0.5,0.1,0.1] env.task=push_red \
    model=ivideogpt model_name=rdall_full_ivideogpt \
    agent.optimizer.objective.objectives.rgb.weight=0.5 \
    agent.optimizer.objective.objectives.classifier.weight=10 \
    agent/optimizer/objective=combined_classifier_mse \
    agent.optimizer.log_every=5 \
    model.pretrained_transformer_path=$CKPT/vp2_robodesk/transformer \
    model.pretrained_vqgan_name_or_path=$CKPT/vp2_robodesk/tokenizer \
    model.config_name=$CKPT/vp2_robodesk/transformer/config.json
