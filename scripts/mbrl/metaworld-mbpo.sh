#!/bin/bash
# MBPO with the iVideoGPT world model on a Metaworld task.
python mbrl_train.py --task_name coffee-push \
    --pretrained_model_path pretrained_models/ivideogpt-oxe-64-act-free \
    --work_dir log_mbrl/coffee-push
