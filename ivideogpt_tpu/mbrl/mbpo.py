"""MBPO workspace: the interactive world-model training loop.

Rebuild of reference mbrl/train_metaworld_mbpo.py:45-406: env stepping with
a DrQ-v2 agent, seed phase, world-model init-train + periodic updates,
batched imagination into an imagined replay buffer, mixed real/fake agent
batches via real_ratio, periodic validate() rollout-vs-GT MSE, eval
episodes, snapshotting.

Config is one dataclass (MBPOConfig) replacing the hydra tree
(reference mbrl/cfgs/mbpo_config.yaml); field defaults mirror that yaml.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

import numpy as np

from ivideogpt_tpu.configs import (ActionModelConfig, LLAMA_BASE,
                                   TOKENIZER_64, TransformerConfig,
                                   _JsonMixin)
from ivideogpt_tpu.mbrl import utils as drq_utils
from ivideogpt_tpu.mbrl.drqv2 import DrQV2Agent
from ivideogpt_tpu.mbrl.logger import Logger
from ivideogpt_tpu.mbrl.replay_buffer import (ReplayBufferStorage,
                                              make_replay_loader,
                                              make_segment_replay_loader)
from ivideogpt_tpu.mbrl.video import (TrainVideoRecorder, VideoRecorder,
                                      save_imagination_gif,
                                      save_validate_gif)
from ivideogpt_tpu.mbrl.video_predictor import VideoPredictor


@dataclass(frozen=True)
class MBPOConfig(_JsonMixin):
    """Knobs mirror reference mbrl/cfgs/mbpo_config.yaml."""
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
    # reference composition: demo_path_prefix/task_name when demo=true
    # (reference train_metaworld_mbpo.py:84, cfgs/mbpo_config.yaml:22-23)
    demo: bool = False
    demo_path_prefix: Optional[str] = None
    seed: int = 1
    save_video: bool = True
    save_train_video: bool = False
    use_tb: bool = True
    # agent
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
    # mbpo
    gen_every_steps: int = 200
    gen_batch: int = 32
    gen_horizon: int = 10
    update_gen_every_step: int = 10
    update_tokenizer_every_step: int = 40
    update_gen_times: int = 1
    init_update_gen_steps: int = 1000
    init_gen_times: int = 20
    real_ratio: float = 0.5
    start_mbpo: int = 4000
    # world model
    wm_context_length: int = 2
    wm_segment_length: int = 12
    wm_action_dim: int = 4
    wm_batch_size: int = 16
    wm_tok_lr: float = 1e-4
    wm_model_lr: float = 1e-4
    # reference mbpo_config.yaml:91-99: tok_wd 0.0, model_wd 0.0 — the
    # online-finetune regime runs without weight decay
    wm_tok_wd: float = 0.0
    wm_model_wd: float = 0.0
    wm_max_target_frames: int = 5
    wm_reward_weight: float = 1.0
    wm_symlog: bool = True
    wm_freeze_codebook: bool = True  # selected_params in the reference
    # pretrained world-model init (reference mbpo_config.yaml:74-80:
    # load_pretrained_model: true, load_internal_llm: true — the MBPO world
    # model STARTS from the published OXE transformer and is finetuned
    # online; this is the "pretrain -> adapt interactively" thesis).
    # Layout: {path}/tokenizer/model.safetensors + {path}/transformer/...
    pretrained_model_path: Optional[str] = None
    load_internal_llm: bool = True
    # pipeline imagination: generate() dispatches the rollout and fetches
    # the PREVIOUS round's result while the device works — the ~200ms
    # device->host transfer (second-largest rollout cost at gen_batch 32)
    # hides under execution. Imagined episodes land in the buffer one
    # gen_every_steps interval later than the reference's synchronous loop;
    # set False for the reference's store-immediately semantics.
    gen_pipeline: bool = True
    # batch N imagination rounds into ONE device program: generate()
    # accumulates start batches for N calls, then rolls out
    # B = N * gen_batch at once. Same total episodes, same per-episode
    # start distribution; the N rounds share one policy/world-model
    # snapshot (at most (N-1) * gen_every_steps of extra policy staleness)
    # in exchange for amortizing the small-batch per-op overhead that
    # dominates TPU decode at B=32 (tools/bench_mbrl_rollout.py numbers in
    # COMPONENTS.md). 1 = the reference cadence.
    #
    # CAVEAT: the round-3 measurement that motivated default=1
    # (489/372/312 f/s at rounds 1/2/4) was taken over a tunneled TPU
    # attachment whose device->host path runs at 6-20 MB/s — the larger
    # result fetch dominates there. On a direct-attached chip (PCIe-class
    # D2H) the trade likely INVERTS; re-measure with
    # `python tools/bench_mbrl_rollout.py --gen_rounds 1,2,4` before
    # trusting this default on real hardware.
    gen_rounds: int = 1


# ---------------------------------------------------------------------------
# Per-task budgets (reference mbrl/cfgs/task/*.yaml). "easy"/"medium"/"hard"
# are the difficulty bases; each concrete task composes "easy" then
# overrides — the same values the reference's hydra compose produces.
# ---------------------------------------------------------------------------

DIFFICULTY_PRESETS = {
    "easy": dict(num_train_frames=1_100_000,
                 stddev_schedule="linear(1.0,0.1,100000)"),
    "medium": dict(num_train_frames=3_100_000,
                   stddev_schedule="linear(1.0,0.1,500000)"),
    "hard": dict(num_train_frames=30_100_000,
                 stddev_schedule="linear(1.0,0.1,2000000)"),
}

_EASY_TASK_OVERRIDES = dict(
    DIFFICULTY_PRESETS["easy"], action_repeat=2, eval_every_frames=2000,
    num_eval_episodes=20, num_train_frames=260002, num_seed_frames=4000)

TASK_PRESETS = {
    name: dict(_EASY_TASK_OVERRIDES, task_name=name.replace("_", "-"))
    for name in ("button_press_topdown_wall", "coffee_push", "door_lock",
                 "hammer", "handle_pull_side", "plate_slide")
}
TASK_PRESETS.update({k: dict(v) for k, v in DIFFICULTY_PRESETS.items()})


def apply_task_preset(cfg: MBPOConfig, preset: str,
                      skip: Optional[set] = None) -> MBPOConfig:
    """Overlay a reference task preset onto cfg (one flag = one reference
    run). ``skip`` lists field names the caller set explicitly on the CLI —
    those win over the preset, matching hydra override semantics."""
    key = preset.replace("-", "_")
    if key not in TASK_PRESETS:
        raise KeyError(
            f"unknown task preset {preset!r}; available: "
            f"{sorted(TASK_PRESETS)}")
    import dataclasses
    have = {f.name for f in dataclasses.fields(cfg)}
    vals = {k: v for k, v in TASK_PRESETS[key].items()
            if k in have and not (skip and k in skip)}
    return cfg.replace(**vals)


class Workspace:
    """Reference Workspace (train_metaworld_mbpo.py:45-386)."""

    def __init__(self, cfg: MBPOConfig, work_dir: Optional[str] = None,
                 env_fn=None, tok_cfg=None, lm_cfg=None):
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

        if not cfg.save_snapshot:
            print("[warn] save_snapshot=False deletes fetched episode files; "
                  "the agent and world-model loaders share the buffer dir "
                  "and will starve each other — use True (reference default)")
        self.replay_storage = ReplayBufferStorage(
            data_specs, self.work_dir / "buffer")
        if cfg.demo and cfg.demo_path is None:
            if not cfg.demo_path_prefix:
                raise ValueError(
                    "demo=true needs demo_path_prefix (or an explicit "
                    "demo_path) — the reference always resolves "
                    "demo_path_prefix/task_name and asserts demos exist "
                    "(reference train_metaworld_mbpo.py:84)")
            cfg = cfg.replace(demo_path=str(
                Path(cfg.demo_path_prefix) / cfg.task_name))
            self.cfg = cfg
        real_bs = int(cfg.batch_size * cfg.real_ratio)
        self.replay_buffer, self.replay_iter_real = make_replay_loader(
            self.work_dir / "buffer", cfg.replay_buffer_size, real_bs,
            cfg.replay_buffer_num_workers, cfg.save_snapshot, cfg.nstep,
            cfg.discount, cfg.demo_path, seed=cfg.seed)

        self.imag_replay_storage = ReplayBufferStorage(
            data_specs, self.work_dir / "imag_buffer")
        self.imag_buffer, self.imag_iter = make_replay_loader(
            self.work_dir / "imag_buffer", cfg.replay_buffer_size,
            cfg.batch_size - real_bs, cfg.replay_buffer_num_workers, False,
            cfg.nstep, cfg.discount, seed=cfg.seed + 1)

        self.seg_buffer, self.seg_iter = make_segment_replay_loader(
            self.work_dir / "buffer", cfg.replay_buffer_size,
            cfg.wm_batch_size, cfg.replay_buffer_num_workers,
            cfg.save_snapshot, cfg.nstep, cfg.discount,
            cfg.gen_horizon + cfg.wm_context_length, cfg.demo_path,
            seed=cfg.seed + 2)

        obs_spec = self.train_env.observation_spec()
        act_spec = self.train_env.action_spec()
        self.agent = DrQV2Agent(
            obs_spec.shape, act_spec.shape[0], lr=cfg.lr,
            feature_dim=cfg.feature_dim, hidden_dim=cfg.hidden_dim,
            critic_target_tau=cfg.critic_target_tau,
            num_expl_steps=cfg.num_expl_steps, update_every_steps=1,
            stddev_schedule=cfg.stddev_schedule, stddev_clip=cfg.stddev_clip,
            seed=cfg.seed)

        tok_cfg = tok_cfg or TOKENIZER_64
        lm_cfg = lm_cfg or LLAMA_BASE
        tok_params = lm_params = llm_params = None
        if cfg.pretrained_model_path:
            from ivideogpt_tpu.utils import checkpoint as ckpt
            tok_dir = os.path.join(cfg.pretrained_model_path, "tokenizer")
            # load re-sliced to the WM context and adopt the checkpoint's
            # config so the module shapes match the (possibly sliced)
            # params (reference mbrl/video_predictor.py:52-56)
            tok_params, loaded_cfg = ckpt.load_tokenizer_for_context(
                tok_dir, cfg.wm_context_length)
            if loaded_cfg is not None:
                tok_cfg = loaded_cfg
            # transformer warm start (reference video_predictor.py:84-89:
            # load_internal_llm -> llm subtree only, heads fresh; else the
            # full HeadModelWithAction state incl. heads)
            tf_dir = os.path.join(cfg.pretrained_model_path, "transformer")
            if os.path.exists(tf_dir):
                if cfg.load_internal_llm:
                    llm_params = ckpt.load_llm_only_safetensors(tf_dir)
                else:
                    lm_params = ckpt.load_action_model_safetensors(tf_dir)
            else:
                print(f"[warn] {tf_dir} absent; world-model LLM starts "
                      "from random init (reference default loads it)")
        head_cfg = ActionModelConfig(
            action_dim=cfg.wm_action_dim, context_length=cfg.wm_context_length,
            segment_length=cfg.wm_segment_length,
            tokens_per_context=tok_cfg.ctx_tokens_per_frame,
            tokens_per_dyna=tok_cfg.dyn_tokens_per_frame,
            reward_prediction=True)
        self.video_predictor = VideoPredictor(
            tok_cfg, lm_cfg, head_cfg, tok_lr=cfg.wm_tok_lr,
            model_lr=cfg.wm_model_lr, tok_wd=cfg.wm_tok_wd,
            model_wd=cfg.wm_model_wd, reward_weight=cfg.wm_reward_weight,
            use_symlog=cfg.wm_symlog, freeze_codebook=cfg.wm_freeze_codebook,
            max_target_frames=cfg.wm_max_target_frames, seed=cfg.seed,
            tok_params=tok_params, lm_params=lm_params,
            llm_params=llm_params)

        # one policy closure for the rollout jit cache (a fresh closure per
        # generate() would recompile the imagination scan every call)
        self._rollout_policy = self.agent.batched_policy(None)

        self.video_recorder = VideoRecorder(
            self.work_dir if cfg.save_video else None)
        self.train_video_recorder = TrainVideoRecorder(
            self.work_dir if cfg.save_train_video else None)

        self.timer = drq_utils.Timer()
        self._global_step = 0
        self._global_episode = 0
        self._pending_gen = None  # in-flight imagination (gen_pipeline)
        self._gen_starts = []     # accumulated start batches (gen_rounds)

    # ------------------------------------------------------------------

    @property
    def global_step(self):
        return self._global_step

    @property
    def global_frame(self):
        return self._global_step * self.cfg.action_repeat

    def mixed_batch(self):
        """Mixed real/imagined agent batch (reference :126-138)."""
        real = next(self.replay_iter_real)
        if self.global_frame >= self.cfg.start_mbpo and \
                self.imag_buffer._episode_fns:
            fake = next(self.imag_iter)
        else:
            fake = next(self.replay_iter_real)
        return tuple(np.concatenate([r, f], 0) for r, f in zip(real, fake))

    def eval(self):
        """Eval episodes in the real env (reference :140-169)."""
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
                self.video_recorder.record(self.eval_env, ts.reward)
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

    def _expl_uniform(self) -> bool:
        """Imagination actions are uniform(-1,1) before num_expl_steps —
        the reference's act2 exploration branch, hit by the init-gen
        rounds at start_mbpo (reference train_metaworld_mbpo.py:175,
        drqv2.py:188-198 with step = global_step - 1)."""
        return max(self.global_step - 1, 0) < self.cfg.num_expl_steps

    def _store_pending_gen(self):
        """Fetch the in-flight imagination round (if any) and store its
        episodes; returns the reward mean or None."""
        if self._pending_gen is None:
            return None
        obss, actions, rewards = self._pending_gen.fetch()
        self._pending_gen = None
        for i in range(len(obss)):
            path = self.imag_replay_storage._store_episode({
                "action": actions[i].astype(np.float32),
                "observation": obss[i].astype(np.uint8),
                "reward": rewards[i][:, None].astype(np.float32),
                "discount": np.ones_like(rewards[i][:, None], np.float32),
            })
            # every 10th imagined episode -> GIF oracle
            # (reference train_metaworld_mbpo.py:193-202)
            if self.cfg.save_video and i % 10 == 0:
                gif = Path(str(path).replace("imag_buffer", "imag_gif")
                           .replace(".npz", ".gif"))
                save_imagination_gif(gif, obss[i].astype(np.uint8),
                                     rewards[i])
        return float(rewards.mean())

    def _dispatch_rollout(self, obs0):
        """Dispatch one imagination rollout for start frames `obs0`.

        Single dispatch site shared by generate() and _flush_gen_starts()
        so the stddev schedule / rollout kwargs can never diverge between
        the regular and the flush path. Returns the in-flight handle."""
        stddev = drq_utils.schedule(self.cfg.stddev_schedule,
                                    max(self.global_step - 1, 0))
        return self.video_predictor.rollout_async(
            obs0, self._rollout_policy, self.agent.state,
            self.cfg.gen_horizon, frame_stack=self.cfg.frame_stack,
            policy_stddev=stddev, expl_uniform=self._expl_uniform())

    def _flush_gen_starts(self):
        """Dispatch any start batches still accumulated under gen_rounds>1.

        Called at run() end ONLY: a mid-run snapshot must NOT flush (the
        partial-batch rollout would trigger a one-off XLA compile and a
        synchronous fetch, stalling training and changing the gen_rounds
        batching cadence); save_snapshot() instead pickles the pending
        starts so a resume owes the same episodes. The flush rollout runs
        at the partial batch size (only reachable with gen_rounds > 1;
        the default 1 never accumulates).
        """
        if not self._gen_starts:
            return
        obs0 = np.concatenate(self._gen_starts, axis=0)
        self._gen_starts = []
        rm = self._store_pending_gen()
        if rm is not None:
            # keep the displaced round's reward stat in the logs (same
            # rationale as save_snapshot)
            self.logger.log_metrics({"gen/reward_mean": rm},
                                    self.global_frame, ty="train")
        self._pending_gen = self._dispatch_rollout(obs0)

    def generate(self):
        """Imagination into the imagined buffer (reference :171-206).

        With cfg.gen_pipeline (default): dispatch this round's rollout,
        then fetch + store the PREVIOUS round while the device executes —
        the result transfer rides under the next rollout / agent updates.

        With cfg.gen_rounds = N > 1: the first N-1 calls only collect start
        batches; the N-th dispatches ONE rollout at B = N * gen_batch."""
        start = time.time()
        # start frames come from the REAL buffer only (reference
        # train_metaworld_mbpo.py:172-175 samples self._replay_iter, not the
        # mixed batch) — and pulling mixed_batch() here would also waste an
        # imagined-loader batch per round
        self._gen_starts.append(
            next(self.replay_iter_real)[0][: self.cfg.gen_batch])
        if len(self._gen_starts) < self.cfg.gen_rounds:
            return {"gen/time": time.time() - start}
        obs0 = np.concatenate(self._gen_starts, axis=0)
        self._gen_starts = []
        pending = self._dispatch_rollout(obs0)
        if self.cfg.gen_pipeline:
            try:
                reward_mean = self._store_pending_gen()
            finally:
                # adopt the just-dispatched round even if the previous
                # round's fetch raised (transient tunnel error): the new
                # rollout is already paid for on-device and must not be
                # dropped with the exception
                self._pending_gen = pending
        else:
            self._pending_gen = pending
            reward_mean = self._store_pending_gen()
        # gen/time under gen_pipeline measures dispatch + the PREVIOUS
        # round's residual wait/store — not this round's rollout compute
        # (that overlaps the following agent updates by design); compare
        # against synchronous logs with gen_pipeline=False
        metrics = {"gen/time": time.time() - start}
        if reward_mean is not None:
            metrics["gen/reward_mean"] = reward_mean
        return metrics

    def validate(self, global_frame):
        """Rollout-vs-GT MSE on a real segment (reference :208-246)."""
        obs, action, reward = next(self.seg_iter)
        k = self.cfg.frame_stack
        # build frame-stacked GT: stack along channels (NHWC)
        stacks = [obs[:, i:obs.shape[1] - (k - 1 - i)] for i in range(k)]
        obs_gt = np.concatenate(stacks, axis=-1)  # [B, T-k+1, h, w, 3k]
        # actions replayed from the step after the initial stacked obs
        # (reference :219: action = batch[1][:, 2:] for frame_stack 3)
        act = action[:, k - 1:]

        start = time.time()
        obs_pred, _, reward_pred = self.video_predictor.rollout(
            obs_gt[:, 0], None, self.agent.state,
            obs_gt.shape[1] - 1, frame_stack=k,
            replay_actions=act[:, : obs_gt.shape[1] - 1])
        obs_mse = float(np.mean(
            (obs_pred[:, 1:] / 255.0 - obs_gt[:, 1:] / 255.0) ** 2))
        # buffer rewards are [B, L, 1]; rollout rewards are [B, T] — align
        # to [B, T] or the subtraction silently mis-broadcasts
        reward_gt = reward[:, k - 1:][:, :obs_gt.shape[1], 0]
        reward_mse = float(np.mean(
            (reward_pred[:, 1:] - reward_gt[:, 1:]) ** 2))
        val_time = time.time() - start  # host GIF encode is not model time
        if self.cfg.save_video:
            # GT | prediction | abs-error GIFs per sample
            # (reference train_metaworld_mbpo.py:226-243)
            for i in range(obs_gt.shape[0]):
                save_validate_gif(
                    self.work_dir / "validate_gif"
                    / f"val-sample-{global_frame}-{i}.gif",
                    obs_gt[i], obs_pred[i], reward_gt[i], reward_pred[i])
        return {"val/obs_mse": obs_mse, "val/reward_mse": reward_mse,
                "val/time": val_time}

    # ------------------------------------------------------------------

    def train(self):
        """Outer loop (reference :248-371)."""
        cfg = self.cfg
        train_until = drq_utils.Until(cfg.num_train_frames, cfg.action_repeat)
        seed_until = drq_utils.Until(cfg.num_seed_frames, cfg.action_repeat)
        eval_every = drq_utils.Every(cfg.eval_every_frames, cfg.action_repeat)
        gen_every = drq_utils.Every(cfg.gen_every_steps, cfg.action_repeat)
        update_gen_every = drq_utils.Every(cfg.update_gen_every_step,
                                           cfg.action_repeat)

        episode_step, episode_reward, episode_success = 0, 0.0, 0.0
        ts = self.train_env.reset()
        self.replay_storage.add(ts)
        self.train_video_recorder.init(ts.observation)
        metrics = None
        init_model = False
        init_gen = False

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
                if cfg.save_snapshot and self._global_episode % 10 == 0:
                    self.save_snapshot()
                    self.video_predictor.save_snapshot(str(self.work_dir))
                episode_step, episode_reward, episode_success = 0, 0.0, 0.0
                if not seed_until(self.global_step) and \
                        self._global_episode % 5 == 0:
                    metrics = self.validate(self.global_frame)
                    self.logger.log_metrics(metrics, self.global_frame,
                                            ty="eval")

            if eval_every(self.global_step):
                self.logger.log("eval/total_time", self.timer.total_time(),
                                self.global_frame)
                self.eval()

            action = self.agent.act(ts.observation, self.global_step,
                                    eval_mode=False)

            if not seed_until(self.global_step):
                if not init_model:
                    for i in range(cfg.init_update_gen_steps):
                        metrics = self.video_predictor.train(
                            next(self.seg_iter))
                        if i % 10 == 0:
                            self.logger.log_metrics(
                                {k + "_init": v for k, v in metrics.items()},
                                i, ty="train")
                    self.video_predictor.save_snapshot(str(self.work_dir),
                                                       suffix="_init")
                    metrics = self.validate(self.global_frame)
                    self.logger.log_metrics(metrics, self.global_frame,
                                            ty="eval")
                    init_model = True
                elif update_gen_every(self.global_step):
                    upd_tok = self.global_step % (
                        cfg.update_tokenizer_every_step // cfg.action_repeat) == 0
                    for _ in range(cfg.update_gen_times):
                        metrics = self.video_predictor.train(
                            next(self.seg_iter), update_tokenizer=upd_tok)
                    self.logger.log_metrics(metrics, self.global_frame,
                                            ty="train")

                if self.global_frame >= cfg.start_mbpo and not init_gen:
                    for _ in range(cfg.init_gen_times):
                        self.generate()
                    init_gen = True

                for _ in range(cfg.agent_update_times):
                    metrics = self.agent.update(self.mixed_batch(),
                                                self.global_step)
                self.logger.log_metrics(metrics, self.global_frame,
                                        ty="train")

                if self.global_frame >= cfg.start_mbpo and \
                        gen_every(self.global_step):
                    metrics = self.generate()
                    self.logger.log_metrics(metrics, self.global_frame,
                                            ty="train")

            ts = self.train_env.step(action)
            episode_reward += ts.reward
            episode_success += ts.success
            self.replay_storage.add(ts)
            self.train_video_recorder.record(ts.observation)
            episode_step += 1
            self._global_step += 1

        # land the last in-flight imagination round — and any start batches
        # still accumulated under gen_rounds>1 — before returning
        self._flush_gen_starts()
        rm = self._store_pending_gen()
        if rm is not None:
            self.logger.log_metrics({"gen/reward_mean": rm},
                                    self.global_frame, ty="train")

    def save_snapshot(self):
        """Agent + counters (reference :374-386), via numpy pickle.

        The in-flight imagination round is fetched and stored (it is
        already computed on device; the fetch is the same one the next
        generate() would do). Start batches accumulated under
        gen_rounds>1 are NOT flushed — a mid-run flush would dispatch a
        partial-batch rollout (one-off compile + synchronous stall) and
        change the batching cadence; they are pickled instead so a resume
        owes exactly the same imagination rounds."""
        import pickle
        rm = self._store_pending_gen()
        if rm is not None:
            # keep the flushed round's reward stat in the logs — dropping
            # it left periodic gaps vs the reference's synchronous curve
            self.logger.log_metrics({"gen/reward_mean": rm},
                                    self.global_frame, ty="train")
        payload = {"agent_state": self.agent.state,
                   "_global_step": self._global_step,
                   "_global_episode": self._global_episode,
                   "_gen_starts": self._gen_starts}
        with (self.work_dir / "snapshot.pkl").open("wb") as f:
            pickle.dump(payload, f)

    def load_snapshot(self):
        import pickle
        with (self.work_dir / "snapshot.pkl").open("rb") as f:
            payload = pickle.load(f)
        self.agent.state = payload["agent_state"]
        self._global_step = payload["_global_step"]
        self._global_episode = payload["_global_episode"]
        self._gen_starts = payload.get("_gen_starts", [])
