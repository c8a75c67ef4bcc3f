"""GIF/mp4 recorders for eval and train episodes (reference mbrl/video.py:10-72).

NHWC observations; frame stacks take the last 3 channels.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


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
            import cv2
            frame = np.ascontiguousarray(frame)
            cv2.putText(frame, f"{reward:.2f}", (10, 10),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.3, (255, 255, 255), 1)
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
