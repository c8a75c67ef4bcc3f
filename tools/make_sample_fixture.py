"""Generate the deterministic synthetic trajectory fixtures under
inference/samples/ (committed to the repo as data oracles, standing in for
the reference's inference/samples/{bair,fractal}_sample.npz which cannot be
redistributed from this environment).

The scene is fully deterministic: a textured background with two moving
sprites driven by a fixed action sequence, so tokenize/generate/detokenize
golden tests have a stable, realistic-ish input. Regenerate with:
  python tools/make_sample_fixture.py
(The committed npz files must NOT change — golden tests pin their bytes.)
"""

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_trajectory(seed: int, T: int = 16, H: int = 64) -> dict:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:H].astype(np.float32) / H
    bg = np.stack([0.3 + 0.4 * xx, 0.2 + 0.5 * yy, 0.6 - 0.3 * xx], -1)
    bg += 0.05 * rng.standard_normal((H, H, 3)).astype(np.float32)

    # two sprites; the first follows the action sequence (an "arm"),
    # the second drifts ballistically (a "distractor object")
    action = rng.uniform(-1, 1, (T, 4)).astype(np.float32)
    pos = np.array([H * 0.3, H * 0.3], np.float32)
    pos2 = np.array([H * 0.7, H * 0.6], np.float32)
    vel2 = rng.uniform(-2, 2, 2).astype(np.float32)

    frames = []
    for t in range(T):
        img = bg.copy()
        pos = np.clip(pos + 4.0 * action[t, :2], 6, H - 7)
        pos2 = np.clip(pos2 + vel2, 6, H - 7)
        r, c = int(pos[0]), int(pos[1])
        img[r - 5:r + 5, c - 5:c + 5] = np.array([0.9, 0.2, 0.1])
        img[r - 2:r + 2, c - 2:c + 2] = np.array([0.95, 0.85, 0.2])
        r2, c2 = int(pos2[0]), int(pos2[1])
        img[r2 - 4:r2 + 4, c2 - 4:c2 + 4] = np.array([0.1, 0.7, 0.3])
        frames.append(np.clip(img, 0, 1))
    video = (np.stack(frames) * 255).astype(np.uint8)
    return {"image": video, "action": action}


def main():
    out_dir = os.path.join(ROOT, "inference", "samples")
    os.makedirs(out_dir, exist_ok=True)
    for name, seed in (("synthetic_sample", 0), ("synthetic_sample2", 1)):
        path = os.path.join(out_dir, f"{name}.npz")
        np.savez_compressed(path, **make_trajectory(seed))
        print(f"wrote {path}")


if __name__ == "__main__":
    sys.exit(main())
