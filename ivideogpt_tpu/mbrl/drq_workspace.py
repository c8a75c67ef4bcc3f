"""Model-free DrQ-v2 baseline workspace (no world model).

Rebuild of reference mbrl/train_metaworld_drq.py:34-238 + mbrl/cfgs/config.yaml:
the plain act -> env.step -> replay -> agent.update loop with eval episodes
and crash-only snapshotting — the baseline iVideoGPT's MBPO is compared
against. Shares the env wrappers, replay buffer, agent, logger, and video
recorders with the MBPO workspace (mbpo.py); the only delta is "no world
model, no imagination".
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import numpy as np

from ivideogpt_tpu.configs import _JsonMixin
from ivideogpt_tpu.mbrl import utils as drq_utils
from ivideogpt_tpu.mbrl.drqv2 import DrQV2Agent
from ivideogpt_tpu.mbrl.logger import Logger
from ivideogpt_tpu.mbrl.replay_buffer import (ReplayBufferStorage,
                                              make_replay_loader)
from ivideogpt_tpu.mbrl.video import TrainVideoRecorder, VideoRecorder


@dataclass(frozen=True)
class DrQConfig(_JsonMixin):
    """Knobs mirror reference mbrl/cfgs/config.yaml."""
    task_name: str = "coffee-push"
    frame_stack: int = 3
    action_repeat: int = 2
    discount: float = 0.99
    num_train_frames: int = 1_000_000
    num_seed_frames: int = 4000
    eval_every_frames: int = 20000
    num_eval_episodes: int = 20
    save_snapshot: bool = True
    replay_buffer_size: int = 1_000_000
    replay_buffer_num_workers: int = 1
    nstep: int = 3
    batch_size: int = 256
    demo_path: Optional[str] = None
    seed: int = 1
    save_video: bool = True
    save_train_video: bool = False
    use_tb: bool = True
    # agent (reference config.yaml agent block)
    lr: float = 1e-4
    feature_dim: int = 50
    hidden_dim: int = 1024
    critic_target_tau: float = 0.01
    num_expl_steps: int = 2000
    stddev_schedule: str = "linear(1.0,0.1,100000)"
    stddev_clip: float = 0.3
    agent_update_times: int = 2
    # metaworld
    camera: str = "corner"
    duration: int = 100
    succ_bonus: float = 10.0


class DrQWorkspace:
    """Reference Workspace (train_metaworld_drq.py:34-215)."""

    def __init__(self, cfg: DrQConfig, work_dir: Optional[str] = None,
                 env_fn=None):
        self.work_dir = Path(work_dir or os.getcwd())
        self.cfg = cfg
        np.random.seed(cfg.seed)

        self.logger = Logger(self.work_dir, use_tb=cfg.use_tb)

        if env_fn is None:
            from ivideogpt_tpu.mbrl import metaworld_env
            env_fn = lambda seed: metaworld_env.make(  # noqa: E731
                cfg.task_name, cfg.frame_stack, cfg.action_repeat, seed,
                cfg.camera, cfg.duration, cfg.succ_bonus)
        self.train_env = env_fn(cfg.seed)
        self.eval_env = env_fn(cfg.seed)

        from dm_env import specs
        data_specs = (self.train_env.observation_spec(),
                      self.train_env.action_spec(),
                      specs.Array((1,), np.float32, "reward"),
                      specs.Array((1,), np.float32, "discount"))
        self.replay_storage = ReplayBufferStorage(
            data_specs, self.work_dir / "buffer")
        self.replay_buffer, self.replay_iter = make_replay_loader(
            self.work_dir / "buffer", cfg.replay_buffer_size, cfg.batch_size,
            cfg.replay_buffer_num_workers, cfg.save_snapshot, cfg.nstep,
            cfg.discount, cfg.demo_path, seed=cfg.seed)

        obs_spec = self.train_env.observation_spec()
        act_spec = self.train_env.action_spec()
        self.agent = DrQV2Agent(
            obs_spec.shape, act_spec.shape[0], lr=cfg.lr,
            feature_dim=cfg.feature_dim, hidden_dim=cfg.hidden_dim,
            critic_target_tau=cfg.critic_target_tau,
            num_expl_steps=cfg.num_expl_steps, update_every_steps=1,
            stddev_schedule=cfg.stddev_schedule, stddev_clip=cfg.stddev_clip,
            seed=cfg.seed)

        self.video_recorder = VideoRecorder(
            self.work_dir if cfg.save_video else None)
        self.train_video_recorder = TrainVideoRecorder(
            self.work_dir if cfg.save_train_video else None)

        self.timer = drq_utils.Timer()
        self._global_step = 0
        self._global_episode = 0

    @property
    def global_step(self):
        return self._global_step

    @property
    def global_frame(self):
        return self._global_step * self.cfg.action_repeat

    def eval(self):
        """Eval episodes (reference train_metaworld_drq.py:101-128)."""
        step, episode, total_reward, total_success = 0, 0, 0.0, 0
        until = drq_utils.Until(self.cfg.num_eval_episodes)
        while until(episode):
            ts = self.eval_env.reset()
            ep_success = 0.0
            self.video_recorder.init(self.eval_env, enabled=(episode == 0))
            while not ts.last():
                action = self.agent.act(ts.observation, self.global_step,
                                        eval_mode=True)
                ts = self.eval_env.step(action)
                # no reward overlay here: the DrQ baseline records plain
                # frames (reference train_metaworld_drq.py:113); only the
                # MBPO eval overlays rewards (train_metaworld_mbpo.py:329)
                self.video_recorder.record(self.eval_env)
                total_reward += ts.reward
                ep_success += ts.success
                step += 1
            total_success += float(ep_success >= 1.0)
            episode += 1
            self.video_recorder.save(f"{self.global_frame}.gif")

        with self.logger.log_and_dump_ctx(self.global_frame, ty="eval") as log:
            log("episode_reward", total_reward / episode)
            log("episode_success", total_success / episode)
            log("episode_length", step * self.cfg.action_repeat / episode)
            log("episode", self._global_episode)
            log("step", self.global_step)

    def train(self):
        """Main loop (reference train_metaworld_drq.py:130-205)."""
        cfg = self.cfg
        train_until = drq_utils.Until(cfg.num_train_frames, cfg.action_repeat)
        seed_until = drq_utils.Until(cfg.num_seed_frames, cfg.action_repeat)
        eval_every = drq_utils.Every(cfg.eval_every_frames, cfg.action_repeat)

        episode_step, episode_reward, episode_success = 0, 0.0, 0.0
        ts = self.train_env.reset()
        self.replay_storage.add(ts)
        self.train_video_recorder.init(ts.observation)
        metrics = None

        while train_until(self.global_step):
            if ts.last():
                self._global_episode += 1
                self.train_video_recorder.save(f"{self.global_frame}.gif")
                if metrics is not None:
                    elapsed, total = self.timer.reset()
                    ep_frame = episode_step * cfg.action_repeat
                    with self.logger.log_and_dump_ctx(self.global_frame,
                                                      ty="train") as log:
                        log("fps", ep_frame / max(elapsed, 1e-9))
                        log("total_time", total)
                        log("episode_reward", episode_reward)
                        log("episode_success", float(episode_success >= 1.0))
                        log("episode_length", ep_frame)
                        log("episode", self._global_episode)
                        log("buffer_size", len(self.replay_storage))
                        log("step", self.global_step)
                ts = self.train_env.reset()
                self.replay_storage.add(ts)
                self.train_video_recorder.init(ts.observation)
                if cfg.save_snapshot:
                    self.save_snapshot()
                episode_step, episode_reward, episode_success = 0, 0.0, 0.0

            if eval_every(self.global_step):
                self.logger.log("eval/total_time", self.timer.total_time(),
                                self.global_frame)
                self.eval()

            action = self.agent.act(ts.observation, self.global_step,
                                    eval_mode=False)

            if not seed_until(self.global_step):
                for _ in range(cfg.agent_update_times):
                    metrics = self.agent.update(next(self.replay_iter),
                                                self.global_step)
                self.logger.log_metrics(metrics, self.global_frame,
                                        ty="train")

            ts = self.train_env.step(action)
            episode_reward += ts.reward
            episode_success += ts.success
            self.replay_storage.add(ts)
            self.train_video_recorder.record(ts.observation)
            episode_step += 1
            self._global_step += 1

    def save_snapshot(self):
        """Agent + counters (reference :207-213), numpy pickle."""
        import pickle
        payload = {"agent_state": self.agent.state,
                   "_global_step": self._global_step,
                   "_global_episode": self._global_episode}
        with (self.work_dir / "snapshot.pkl").open("wb") as f:
            pickle.dump(payload, f)

    def load_snapshot(self):
        import pickle
        with (self.work_dir / "snapshot.pkl").open("rb") as f:
            payload = pickle.load(f)
        self.agent.state = payload["agent_state"]
        self._global_step = payload["_global_step"]
        self._global_episode = payload["_global_episode"]
