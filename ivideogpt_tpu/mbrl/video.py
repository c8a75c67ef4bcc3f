"""GIF/mp4 recorders for eval and train episodes (reference mbrl/video.py:10-72).

NHWC observations; frame stacks take the last 3 channels.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _overlay_reward(frame: np.ndarray, reward: float) -> np.ndarray:
    """Reward text in the top-left corner (reference
    train_metaworld_mbpo.py:200, :239-240)."""
    import cv2
    frame = np.ascontiguousarray(frame)
    cv2.putText(frame, f"{reward:.2f}", (10, 10),
                cv2.FONT_HERSHEY_SIMPLEX, 0.3, (255, 255, 255), 1)
    return frame


def save_imagination_gif(path, obs_stack: np.ndarray, rewards: np.ndarray):
    """One imagined episode -> GIF of the newest frame of each stacked obs,
    reward overlaid (reference train_metaworld_mbpo.py:193-202).

    obs_stack: [T, H, W, 3k] uint8 NHWC; rewards: [T]."""
    import imageio
    path = Path(path)
    path.parent.mkdir(exist_ok=True, parents=True)
    frames = [_overlay_reward(obs_stack[t, ..., -3:], float(rewards[t]))
              for t in range(obs_stack.shape[0])]
    imageio.mimsave(str(path), frames, fps=4, loop=0)


def save_validate_gif(path, obs_gt: np.ndarray, obs_pred: np.ndarray,
                      reward_gt: np.ndarray, reward_pred: np.ndarray):
    """[ground truth | prediction | abs error] triptych per step, rewards
    overlaid from step 1 on (reference train_metaworld_mbpo.py:226-243).

    obs_gt/obs_pred: [T, H, W, 3k] uint8-scaled NHWC; rewards: [T]."""
    import imageio
    path = Path(path)
    path.parent.mkdir(exist_ok=True, parents=True)
    frames = []
    for t in range(obs_gt.shape[0]):
        gt = obs_gt[t, ..., -3:].astype(np.uint8)
        pred = obs_pred[t, ..., -3:].astype(np.uint8)
        err = np.abs(gt.astype(float) - pred.astype(float)).astype(np.uint8)
        if t > 0:
            gt = _overlay_reward(gt, float(reward_gt[t]))
            pred = _overlay_reward(pred, float(reward_pred[t]))
        frames.append(np.concatenate([gt, pred, err], axis=1))
    imageio.mimsave(str(path), frames, fps=4, loop=0)


class VideoRecorder:
    def __init__(self, root_dir, render_size: int = 256, fps: int = 20):
        self.save_dir = None
        if root_dir is not None:
            self.save_dir = Path(root_dir) / "eval_video"
            self.save_dir.mkdir(exist_ok=True, parents=True)
        self.render_size = render_size
        self.fps = fps
        self.frames = []
        self.enabled = False

    def init(self, env, enabled: bool = True):
        self.frames = []
        self.enabled = self.save_dir is not None and enabled
        self.record(env)

    def record(self, env, reward=None):
        if not self.enabled:
            return
        frame = env.render()
        if reward is not None:
            frame = _overlay_reward(frame, float(reward))
        self.frames.append(frame)

    def save(self, file_name: str):
        if self.enabled:
            import imageio
            imageio.mimsave(str(self.save_dir / file_name), self.frames,
                            fps=self.fps)


class TrainVideoRecorder:
    def __init__(self, root_dir, render_size: int = 256, fps: int = 20):
        self.save_dir = None
        if root_dir is not None:
            self.save_dir = Path(root_dir) / "train_video"
            self.save_dir.mkdir(exist_ok=True, parents=True)
        self.render_size = render_size
        self.fps = fps
        self.frames = []
        self.enabled = False

    def init(self, obs, enabled: bool = True):
        self.frames = []
        self.enabled = self.save_dir is not None and enabled
        self.record(obs)

    def record(self, obs):
        if not self.enabled:
            return
        import cv2
        frame = cv2.resize(obs[..., -3:],
                           dsize=(self.render_size, self.render_size),
                           interpolation=cv2.INTER_CUBIC)
        self.frames.append(frame)

    def save(self, file_name: str):
        if self.enabled:
            import imageio
            imageio.mimsave(str(self.save_dir / file_name), self.frames,
                            fps=self.fps)
