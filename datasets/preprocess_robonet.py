"""RoboNet hdf5 -> per-trajectory npz (host tool).

Rebuild of reference datasets/preprocess_robonet.py:1-127: decodes the cam0
video (mp4 or per-frame jpg), normalizes actions to 5 dims (autograsp
synthesizes the gripper channel from the next state; short actions are
zero-padded; long ones truncated), splits train/test by the published
filename list.

Usage:
  python datasets/preprocess_robonet.py --hdf5_path /data/robonet/hdf5 \
      --save_path /data/robonet_npz
"""

import argparse
import hashlib
import io
import os

import numpy as np


def load_camera_imgs(cam_index, hf, meta, start_time=0, n_load=None):
    """Decode one camera stream to [T, H, W, 3] uint8 RGB
    (reference preprocess_robonet.py:14-46)."""
    import cv2
    cam = hf["env"][f"cam{cam_index}_video"]
    old_h, old_w = meta["frame_dim"]
    n_load = n_load if n_load is not None else meta["img_T"]

    images = np.zeros((n_load, old_h, old_w, 3), dtype=np.uint8)
    if meta["img_encoding"] == "mp4":
        import imageio
        buf = io.BytesIO(cam["frames"][:].tobytes())
        frames = [img for img in imageio.get_reader(buf, format="mp4")]
    elif meta["img_encoding"] == "jpg":
        frames = [cv2.imdecode(cam[f"frame{t}"][:], cv2.IMREAD_COLOR)[..., ::-1]
                  for t in range(start_time, start_time + n_load)]
    else:
        raise ValueError(f"encoding {meta['img_encoding']} not supported")
    for t, img in enumerate(frames[:n_load]):
        images[t] = img

    if meta["image_format"] == "BGR":
        images = images[..., ::-1]
    elif meta["image_format"] != "RGB":
        raise NotImplementedError(meta["image_format"])
    return images


def load_actions(hf, meta):
    """Normalize to 5-dim actions (reference preprocess_robonet.py:49-70)."""
    a_T, adim = meta["action_T"], meta["adim"]
    actions = hf["policy"]["actions"][:]
    if adim == 5:
        return actions
    if adim == 4 and meta["primitives"] == "autograsp":
        grip = np.zeros((a_T, 1))
        next_state = hf["env"]["state"][:][1:, -1]
        hi, lo = meta["high_bound"][-1], meta["low_bound"][-1]
        mid = (hi + lo) / 2.0
        grip[:, 0] = np.where(next_state > mid, hi, lo)
        return np.concatenate([actions, grip], axis=-1)
    if adim < 4:
        pad = np.zeros((a_T, 5 - adim), np.float32)
        return np.concatenate([actions, pad], axis=-1)
    return actions[:, :5]


def load_data(f_name, meta):
    import h5py
    with open(f_name, "rb") as f:
        buf = f.read()
    assert hashlib.sha256(buf).hexdigest() == meta["sha256"], \
        "file hash doesn't match metadata"
    with h5py.File(io.BytesIO(buf)) as hf:
        n_states = min(meta["state_T"], meta["img_T"], meta["action_T"] + 1)
        assert n_states > 1
        images = load_camera_imgs(0, hf, meta, 0, n_states)
        actions = load_actions(hf, meta).astype(np.float32)[: n_states - 1]
    return images, actions


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hdf5_path", type=str, required=True)
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--testset_filenames", type=str,
                   default="datasets/robonet/robonet_testset_filenames.txt")
    args = p.parse_args()

    from datasets.robonet.metadata_helper import load_metadata

    os.makedirs(os.path.join(args.save_path, "train"), exist_ok=True)
    os.makedirs(os.path.join(args.save_path, "test"), exist_ok=True)
    with open(args.testset_filenames) as f:
        test_files = {line.strip() for line in f}

    meta_frame = load_metadata(args.hdf5_path)
    for file_name in sorted(os.listdir(args.hdf5_path)):
        if not file_name.endswith(".hdf5"):
            continue
        split = "test" if file_name in test_files else "train"
        out = os.path.join(args.save_path, split,
                           file_name.split(".")[0] + ".npz")
        path = os.path.join(args.hdf5_path, file_name)
        imgs, actions = load_data(path, meta_frame.get_file_metadata(path))
        np.savez_compressed(out, image=imgs, action=actions)
    print("done")


if __name__ == "__main__":
    main()
