"""OXE RLDS -> per-episode npz converter (host tool, no device code).

Rebuild of reference datasets/oxe_data_converter.py:1-63: extracts the
display-key camera stream from each RLDS episode into a compressed npz.
Requires tensorflow_datasets (gated; this environment may not have it).

Usage:
  python datasets/oxe_data_converter.py --dataset_name fractal20220817_data \
      --input_path /data/tensorflow_datasets --output_path /data/oxe
"""

import argparse
import os

import numpy as np

# camera key per dataset (reference oxe_data_converter.py:8-22; superset
# lives in ivideogpt_tpu.data.npz_dataset.DISPLAY_KEY)
DISPLAY_KEY = {
    "taco_play": "rgb_static",
    "roboturk": "front_rgb",
    "viola": "agentview_rgb",
    "language_table": "rgb",
    "stanford_robocook_converted_externally_to_rlds1": "image_1",
    "stanford_robocook_converted_externally_to_rlds2": "image_2",
    "stanford_robocook_converted_externally_to_rlds3": "image_3",
    "stanford_robocook_converted_externally_to_rlds4": "image_4",
    "uiuc_d3field1": "image_1",
    "uiuc_d3field2": "image_2",
    "uiuc_d3field3": "image_3",
    "uiuc_d3field4": "image_4",
}


def get_dataset_path(parent_dir: str, dataset_name: str) -> str:
    """RLDS version quirks per dataset (reference :24-34)."""
    if dataset_name in ("robo_net", "cmu_playing_with_food"):
        version = "1.0.0"
    elif dataset_name == "language_table":
        version = "0.0.1"
    elif dataset_name[:-1] in ("uiuc_d3field",
                               "stanford_robocook_converted_externally_to_rlds"):
        dataset_name = dataset_name[:-1]
        version = "0.1.0"
    else:
        version = "0.1.0"
    return os.path.join(parent_dir, dataset_name, version)


def convert(dataset_name: str, input_path: str, output_path: str,
            max_num_episodes=None):
    try:
        import tensorflow_datasets as tfds
    except ImportError as e:
        raise SystemExit(
            "tensorflow_datasets is required for OXE conversion; install it "
            "on the data-prep host (this is a host-side tool).") from e

    ds = tfds.builder_from_directory(
        builder_dir=get_dataset_path(input_path, dataset_name)).as_dataset()
    display_key = DISPLAY_KEY.get(dataset_name, "image")
    root = os.path.join(output_path, dataset_name)
    os.makedirs(root, exist_ok=True)

    n = 0
    for split in ds:
        for i, episode in enumerate(ds[split]):
            out = os.path.join(root, f"{split}_eps_{i:08d}.npz")
            if os.path.exists(out):
                continue
            frames = np.array([step["observation"][display_key]
                               for step in episode["steps"]])
            np.savez_compressed(out, **{display_key: frames})
            n += 1
            if max_num_episodes is not None and n >= max_num_episodes:
                return n
    return n


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_name", type=str, default="fractal20220817_data")
    p.add_argument("--input_path", type=str, required=True)
    p.add_argument("--output_path", type=str, default="inputs")
    p.add_argument("--max_num_episodes", type=int, default=None)
    a = p.parse_args()
    n = convert(a.dataset_name, a.input_path, a.output_path,
                a.max_num_episodes)
    print(f"converted {n} episodes")
