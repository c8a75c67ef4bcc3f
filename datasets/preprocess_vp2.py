"""VP2 (robodesk/robosuite) hdf5 -> per-demo npz (host tool).

Rebuild of reference datasets/preprocess_vp2.py:1-80: walks the hdf5 tree,
reads train/valid demo masks, extracts the task camera + actions; robodesk
noise variants get their own output subdirs.

Usage:
  python datasets/preprocess_vp2.py --dir_path /data/vp2 --save_path /data/vp2_npz
"""

import argparse
import os

import numpy as np


def load_and_convert(file_path: str, save_path: str, mode: str = "train"):
    import h5py
    assert mode in ("train", "valid")
    mode_name = "train" if mode == "train" else "validation"
    with h5py.File(file_path, "r", swmr=False, libver="latest") as hf:
        demos = [d.decode("utf-8") for d in np.array(hf[f"mask/{mode}"][:])]
        for demo in demos:
            demo_name = demo[:5] + demo[5:].zfill(5)
            out = os.path.join(save_path, f"{mode_name}_eps_{demo_name}.npz")
            if os.path.exists(out):
                continue
            if "robodesk" in save_path:
                obs = hf[f"data/{demo}/obs/camera_image"][()]
            else:
                assert "robosuite" in save_path
                obs = hf[f"data/{demo}/obs/agentview_shift_2_image"][()]
            actions = hf[f"data/{demo}/actions"][()]
            np.savez_compressed(out, image=obs, action=actions)


def process_files(file_dir: str, save_dir: str, mode: str):
    mode_name = "train" if mode == "train" else "validation"
    for name in sorted(os.listdir(file_dir)):
        path = os.path.join(file_dir, name)
        if os.path.isdir(path):
            sub = os.path.join(save_dir, name)
            os.makedirs(sub, exist_ok=True)
            process_files(path, sub, mode)
            continue
        if "robodesk" in path:
            if "noise_0.1" in path:
                sub = os.path.join(save_dir, f"{mode_name}_noise1")
            elif "noise_0.2" in path:
                sub = os.path.join(save_dir, f"{mode_name}_noise2")
            else:
                raise AssertionError(f"unexpected robodesk file {path}")
        else:
            sub = os.path.join(save_dir, mode_name)
        os.makedirs(sub, exist_ok=True)
        load_and_convert(path, sub, mode)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dir_path", type=str, required=True)
    p.add_argument("--save_path", type=str, required=True)
    a = p.parse_args()
    os.makedirs(a.save_path, exist_ok=True)
    process_files(a.dir_path, a.save_path, "train")
    process_files(a.dir_path, a.save_path, "valid")
