"""BAIR robot-pushing tfrecords -> per-trajectory npz (host tool).

Rebuild of reference datasets/preprocess_bair.py:1-81: each 30-step
trajectory becomes one npz with keys {image, aux1_image, action} (the eval
pipeline reads aux1_image, see DISPLAY_KEY).

Usage:
  python datasets/preprocess_bair.py --input_path /data/bair/softmotion30_44k \
      --save_path /data/bair_npz
"""

import argparse
import glob
import os

import numpy as np


def _sorted_tfrecords(data_dir):
    files = glob.glob(os.path.join(data_dir, "*.tfrecords"))
    assert files, f"No tfrecords files found in {data_dir}"

    def key(f):
        stem = os.path.basename(f).split(".")[0]
        start = int(stem.split("_to_")[0].split("traj_")[-1])
        return start
    return sorted(files, key=key)


def convert_split(input_path: str, save_path: str, split: str,
                  save_gif: bool = False):
    import tensorflow as tf
    from PIL import Image

    out_dir = os.path.join(save_path, split)
    os.makedirs(out_dir, exist_ok=True)
    if save_gif:
        os.makedirs(os.path.join(save_path, "gif"), exist_ok=True)

    n = 0
    for f in _sorted_tfrecords(os.path.join(input_path, split)):
        stem = os.path.basename(f).split(".")[0]
        file_index = int(stem.split("_to_")[0].split("traj_")[-1]) - 1
        for serialized in tf.compat.v1.io.tf_record_iterator(f):
            file_index += 1
            ex = tf.train.Example()
            ex.ParseFromString(serialized)
            mains, auxs, acts = [], [], []
            for i in range(30):  # 30 steps per BAIR trajectory
                feat = ex.features.feature
                main = Image.frombytes(
                    "RGB", (64, 64),
                    feat[f"{i}/image_main/encoded"].bytes_list.value[0])
                aux = Image.frombytes(
                    "RGB", (64, 64),
                    feat[f"{i}/image_aux1/encoded"].bytes_list.value[0])
                action = [feat[f"{i}/action"].float_list.value[j]
                          for j in range(4)]
                mains.append(np.asarray(main))
                auxs.append(np.asarray(aux))
                acts.append(np.asarray(action))
            out = os.path.join(out_dir, f"traj_{file_index:05d}.npz")
            np.savez_compressed(out, image=np.stack(mains),
                                action=np.stack(acts),
                                aux1_image=np.stack(auxs))
            n += 1
            if save_gif:
                imgs = [Image.fromarray(np.uint8(x)) for x in auxs]
                imgs[0].save(os.path.join(save_path, "gif",
                                          f"traj_{file_index:05d}.gif"),
                             save_all=True, append_images=imgs[1:],
                             duration=50, loop=0)
    return n


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--input_path", type=str, required=True)
    p.add_argument("--save_path", type=str, required=True)
    p.add_argument("--save_gif", action="store_true")
    a = p.parse_args()
    for split in ("train", "test"):
        n = convert_split(a.input_path, a.save_path, split, a.save_gif)
        print(f"{split}: {n} trajectories")
