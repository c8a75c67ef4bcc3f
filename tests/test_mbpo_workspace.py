"""MBPO workspace integration test with a fake dm_env (tiny configs, CPU).

Exercises the full loop briefly: seed phase -> world-model init train ->
agent updates -> imagination generate -> validate, verifying the whole
pipeline (reference train_metaworld_mbpo.py:248-371) is wired."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dm_env
from dm_env import StepType, specs

from ivideogpt_tpu.configs import TransformerConfig
from ivideogpt_tpu.mbrl.metaworld_env import (ActionDTypeWrapper,
                                              ActionScaleWrapper,
                                              ExtendedTimeStepWrapper,
                                              FrameStackWrapper,
                                              MetaWorldTimeStep)
from ivideogpt_tpu.mbrl.mbpo import MBPOConfig, Workspace
from tests.test_tokenizer_model import TINY

TINY_LM = TransformerConfig(
    vocab_size=TINY.vocab_size, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
    max_position_embeddings=512)


class FakeTask(dm_env.Environment):
    """32x32 random-pixel env with a 4-dim action space."""

    def __init__(self, seed=0, duration=12):
        self._rng = np.random.default_rng(seed)
        self._duration = duration
        self._steps = None

    def observation_spec(self):
        return specs.BoundedArray((32, 32, 3), np.uint8, 0, 255, "observation")

    def action_spec(self):
        return specs.BoundedArray((4,), np.float32, -2.0, 2.0, "action")

    def _obs(self):
        return self._rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)

    def reset(self):
        self._steps = 0
        return MetaWorldTimeStep(StepType.FIRST, 0.0, 1.0, self._obs(), 0.0)

    def step(self, action):
        self._steps += 1
        done = self._steps >= self._duration
        return MetaWorldTimeStep(
            StepType.LAST if done else StepType.MID,
            float(np.sum(action)) * 0.01, 1.0, self._obs(), 0.0)

    def render(self):
        return self._obs()


def make_fake_env(seed):
    env = FakeTask(seed)
    env = ActionDTypeWrapper(env, np.float32)
    env = ActionScaleWrapper(env, -1.0, 1.0)
    env = FrameStackWrapper(env, 3)
    env = ExtendedTimeStepWrapper(env)
    return env


def test_env_wrappers():
    env = make_fake_env(0)
    ts = env.reset()
    assert ts.observation.shape == (32, 32, 9)
    assert ts.first()
    ts = env.step(np.ones(4, np.float32))
    assert ts.observation.shape == (32, 32, 9)
    assert ts.action.shape == (4,)
    assert ts.reward != 0.0


def test_task_presets_match_reference_yamls():
    """TASK_PRESETS values = the reference hydra compose results
    (reference mbrl/cfgs/task/*.yaml: every concrete task inherits `easy`
    then pins the 260002-frame budget)."""
    from ivideogpt_tpu.mbrl.mbpo import (TASK_PRESETS, apply_task_preset)
    concrete = ["button_press_topdown_wall", "coffee_push", "door_lock",
                "hammer", "handle_pull_side", "plate_slide"]
    for name in concrete:
        p = TASK_PRESETS[name]
        assert p["task_name"] == name.replace("_", "-")
        assert p["action_repeat"] == 2
        assert p["eval_every_frames"] == 2000
        assert p["num_eval_episodes"] == 20
        assert p["num_train_frames"] == 260002
        assert p["num_seed_frames"] == 4000
        assert p["stddev_schedule"] == "linear(1.0,0.1,100000)"
    assert TASK_PRESETS["medium"]["num_train_frames"] == 3_100_000
    assert TASK_PRESETS["medium"]["stddev_schedule"] == \
        "linear(1.0,0.1,500000)"
    assert TASK_PRESETS["hard"]["num_train_frames"] == 30_100_000

    cfg = apply_task_preset(MBPOConfig(), "coffee-push")
    assert cfg.task_name == "coffee-push"
    assert cfg.num_train_frames == 260002
    # explicit CLI values win over the preset (hydra override semantics)
    cfg = apply_task_preset(MBPOConfig(num_train_frames=7),
                            "coffee_push", skip={"num_train_frames"})
    assert cfg.num_train_frames == 7
    # reference wd regime is exposed and defaults to 0.0/0.0
    # (mbpo_config.yaml:91-99)
    assert MBPOConfig().wm_tok_wd == 0.0 and MBPOConfig().wm_model_wd == 0.0
    with pytest.raises(KeyError):
        apply_task_preset(MBPOConfig(), "nope")


def _tiny_mbpo_cfg(**kw):
    base = dict(
        num_train_frames=80, num_seed_frames=40, num_expl_steps=20,
        action_repeat=2, eval_every_frames=10**9, batch_size=8,
        real_ratio=0.5, nstep=1, duration=12, save_video=False,
        save_snapshot=True, use_tb=False, replay_buffer_num_workers=1,
        init_update_gen_steps=2, init_gen_times=1, gen_every_steps=20,
        gen_batch=2, gen_horizon=2, update_gen_every_step=10,
        agent_update_times=1, start_mbpo=44,
        wm_context_length=2, wm_segment_length=4, wm_batch_size=2,
        wm_max_target_frames=2, stddev_schedule="0.2",
        feature_dim=16, hidden_dim=32)
    base.update(kw)
    return MBPOConfig(**base)


def _export_world_model_checkpoint(tmp_path, seed=123):
    """Export a donor world model as a {tokenizer,transformer} checkpoint
    dir (the layout MBPO's pretrained_model_path expects)."""
    from ivideogpt_tpu.configs import ActionModelConfig
    from ivideogpt_tpu.mbrl.video_predictor import VideoPredictor
    from ivideogpt_tpu.utils import checkpoint as ckpt

    head = ActionModelConfig(
        action_dim=4, context_length=2, segment_length=4,
        tokens_per_context=TINY.ctx_tokens_per_frame,
        tokens_per_dyna=TINY.dyn_tokens_per_frame, reward_prediction=True)
    donor = VideoPredictor(TINY, TINY_LM, head, seed=seed,
                           max_target_frames=2)
    model_dir = tmp_path / "pretrained"
    (model_dir / "tokenizer").mkdir(parents=True)
    (model_dir / "transformer").mkdir()
    ckpt.export_tokenizer_safetensors(
        donor.tok_state.params,
        str(model_dir / "tokenizer" / "model.safetensors"))
    (model_dir / "tokenizer" / "config.json").write_text(TINY.to_json())
    ckpt._write_safetensors(
        str(model_dir / "transformer" / "model.safetensors"),
        ckpt.flax_to_torch_action_model(donor.model_state.params))
    return donor, model_dir


@pytest.mark.parametrize("load_internal_llm", [
    pytest.param(True, marks=pytest.mark.slow), False])
def test_mbpo_pretrained_world_model(tmp_path, load_internal_llm):
    """pretrained_model_path initializes the WORLD MODEL, not just the
    tokenizer: llm params must equal the checkpoint (reference
    mbrl/video_predictor.py:84-89, load_pretrained_model+load_internal_llm
    defaults in mbpo_config.yaml:74-80)."""
    donor, model_dir = _export_world_model_checkpoint(tmp_path)
    cfg = _tiny_mbpo_cfg(pretrained_model_path=str(model_dir),
                         load_internal_llm=load_internal_llm)
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    ws = Workspace(cfg, work_dir=str(run_dir), env_fn=make_fake_env,
                   tok_cfg=TINY, lm_cfg=TINY_LM)
    got = ws.video_predictor.model_state.params["params"]
    want = donor.model_state.params["params"]
    # the llm subtree equals the checkpoint bit-exactly in both modes
    for (pg, g), (pw, w) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(got["llm"]),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(want["llm"]),
                   key=lambda t: str(t[0]))):
        assert str(pg) == str(pw)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w), str(pg))
    # reward head: fresh-init under load_internal_llm (different seed than
    # the donor -> different values), checkpoint-equal otherwise
    got_rw = np.asarray(got["reward_linear"]["kernel"])
    want_rw = np.asarray(want["reward_linear"]["kernel"])
    if load_internal_llm:
        assert not np.array_equal(got_rw, want_rw)
    else:
        np.testing.assert_array_equal(got_rw, want_rw)
    # tokenizer weights came from the checkpoint too
    got_tok = jax.tree_util.tree_leaves(
        ws.video_predictor.tok_state.params)
    want_tok = jax.tree_util.tree_leaves(donor.tok_state.params)
    for g, w in zip(got_tok, want_tok):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.slow
def test_mbpo_pretrained_ctx_mismatch_resliced(tmp_path):
    """wm_context_length SMALLER than the checkpoint's tokenizer context:
    the kv pos-embs are sliced AND the module config adopts the new
    context, so the world model actually tokenizes (this path used to
    slice the params but build the tokenizer at the checkpoint ctx —
    crash in tokenize's context assert)."""
    _, model_dir = _export_world_model_checkpoint(tmp_path)   # ctx=2 ckpt
    cfg = _tiny_mbpo_cfg(pretrained_model_path=str(model_dir),
                         wm_context_length=1, wm_segment_length=3)
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    ws = Workspace(cfg, work_dir=str(run_dir), env_fn=make_fake_env,
                   tok_cfg=TINY, lm_cfg=TINY_LM)
    vp = ws.video_predictor
    assert vp.tok_cfg.context_length == 1
    # the sliced tokenizer runs a real tokenize at the WM context
    px = np.linspace(0, 1, 2 * 3 * 32 * 32 * 3,
                     dtype=np.float32).reshape(2, 3, 32, 32, 3)
    ids, _ = vp.tokenizer.apply(vp.tok_state.params, jnp.asarray(px), 1,
                                method=vp.tokenizer.tokenize)
    assert np.isfinite(np.asarray(ids)).all()


@pytest.mark.slow
def test_mbpo_smoke_from_pretrained(tmp_path):
    """The full MBPO loop runs starting from a pretrained world model."""
    _, model_dir = _export_world_model_checkpoint(tmp_path)
    cfg = _tiny_mbpo_cfg(pretrained_model_path=str(model_dir))
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    ws = Workspace(cfg, work_dir=str(run_dir), env_fn=make_fake_env,
                   tok_cfg=TINY, lm_cfg=TINY_LM)
    ws.train()
    assert ws.global_step == 40
    assert ws.imag_replay_storage._num_episodes >= 1


@pytest.mark.slow
def test_mbpo_workspace_smoke(tmp_path):
    cfg = MBPOConfig(
        num_train_frames=80, num_seed_frames=40, num_expl_steps=20,
        action_repeat=2, eval_every_frames=10**9, batch_size=8,
        real_ratio=0.5, nstep=1, duration=12, save_video=False,
        # save_snapshot=False would DELETE fetched episode files, starving
        # whichever of the real/segment loaders fetches second (they share
        # the buffer dir); the reference always runs with true
        # (mbrl/cfgs/mbpo_config.yaml)
        save_snapshot=True, use_tb=False, replay_buffer_num_workers=1,
        init_update_gen_steps=2, init_gen_times=1, gen_every_steps=20,
        gen_batch=2, gen_horizon=2, update_gen_every_step=10,
        agent_update_times=1, start_mbpo=44,
        wm_context_length=2, wm_segment_length=4, wm_batch_size=2,
        wm_max_target_frames=2, stddev_schedule="0.2",
        feature_dim=16, hidden_dim=32)
    ws = Workspace(cfg, work_dir=str(tmp_path), env_fn=make_fake_env,
                   tok_cfg=TINY, lm_cfg=TINY_LM)
    ws.train()
    # seed phase wrote real episodes; mbpo phase generated imagined ones
    # (imag FILES are consumed by the imag loader — save_snapshot=False by
    # design — so assert the storage counter, not the directory)
    assert len(list((tmp_path / "buffer").glob("*.npz"))) >= 2
    assert ws.imag_replay_storage._num_episodes >= 1
    assert ws.global_step == 40


@pytest.mark.slow
def test_generate_pipeline_defers_one_round(tmp_path):
    """cfg.gen_pipeline (default): generate() dispatches round i and stores
    round i-1 — episodes land one call later; save_snapshot() flushes the
    in-flight round so resumes never lose imagined data."""
    cfg = _tiny_mbpo_cfg(start_mbpo=0)
    ws = Workspace(cfg, work_dir=str(tmp_path), env_fn=make_fake_env,
                   tok_cfg=TINY, lm_cfg=TINY_LM)
    # seed the real buffer so mixed_batch works
    ts = ws.train_env.reset()
    ws.replay_storage.add(ts)
    while not ts.last():
        ts = ws.train_env.step(ws.train_env.action_spec().generate_value())
        ws.replay_storage.add(ts)

    assert ws.imag_replay_storage._num_episodes == 0
    m1 = ws.generate()
    assert ws.imag_replay_storage._num_episodes == 0      # round 1 in flight
    assert "gen/reward_mean" not in m1                     # nothing fetched
    m2 = ws.generate()
    assert ws.imag_replay_storage._num_episodes == cfg.gen_batch
    assert "gen/reward_mean" in m2
    ws.save_snapshot()                                     # flush round 2
    assert ws.imag_replay_storage._num_episodes == 2 * cfg.gen_batch
    assert ws._pending_gen is None

    # gen_pipeline=False restores the reference's store-immediately loop
    cfg2 = _tiny_mbpo_cfg(start_mbpo=0, gen_pipeline=False)
    ws2 = Workspace(cfg2, work_dir=str(tmp_path / "sync"),
                    env_fn=make_fake_env, tok_cfg=TINY, lm_cfg=TINY_LM)
    ts = ws2.train_env.reset()
    ws2.replay_storage.add(ts)
    while not ts.last():
        ts = ws2.train_env.step(ws2.train_env.action_spec().generate_value())
        ws2.replay_storage.add(ts)
    m = ws2.generate()
    assert ws2.imag_replay_storage._num_episodes == cfg2.gen_batch
    assert "gen/reward_mean" in m


def test_generate_rounds_batch_into_one_program(tmp_path):
    """cfg.gen_rounds=N: N-1 calls accumulate start batches, the N-th rolls
    out B = N * gen_batch in one device program (same total episodes)."""
    cfg = _tiny_mbpo_cfg(start_mbpo=0, gen_rounds=2, gen_pipeline=False)
    ws = Workspace(cfg, work_dir=str(tmp_path), env_fn=make_fake_env,
                   tok_cfg=TINY, lm_cfg=TINY_LM)
    ts = ws.train_env.reset()
    ws.replay_storage.add(ts)
    while not ts.last():
        ts = ws.train_env.step(ws.train_env.action_spec().generate_value())
        ws.replay_storage.add(ts)

    ws.generate()                                  # collects starts only
    assert ws.imag_replay_storage._num_episodes == 0
    assert len(ws._gen_starts) == 1
    ws.generate()                                  # rolls out B = 2 * gen_batch
    assert len(ws._gen_starts) == 0
    assert ws.imag_replay_storage._num_episodes == 2 * cfg.gen_batch


@pytest.mark.slow
def test_snapshot_preserves_accumulated_gen_starts(tmp_path):
    """A mid-run snapshot must NOT flush accumulated gen_rounds starts (a
    partial-batch rollout would compile a one-off program and stall the
    loop); the starts are pickled and restored, so a resume owes exactly
    the same imagination rounds."""
    cfg = _tiny_mbpo_cfg(start_mbpo=0, gen_rounds=2, gen_pipeline=False)
    ws = Workspace(cfg, work_dir=str(tmp_path), env_fn=make_fake_env,
                   tok_cfg=TINY, lm_cfg=TINY_LM)
    ts = ws.train_env.reset()
    ws.replay_storage.add(ts)
    while not ts.last():
        ts = ws.train_env.step(ws.train_env.action_spec().generate_value())
        ws.replay_storage.add(ts)

    ws.generate()                               # collects one start batch
    assert len(ws._gen_starts) == 1
    ws.save_snapshot()
    # no partial-batch rollout was dispatched, starts kept in memory
    assert ws.imag_replay_storage._num_episodes == 0
    assert len(ws._gen_starts) == 1

    ws2 = Workspace(cfg, work_dir=str(tmp_path), env_fn=make_fake_env,
                    tok_cfg=TINY, lm_cfg=TINY_LM)
    ws2.load_snapshot()
    assert len(ws2._gen_starts) == 1
    np.testing.assert_array_equal(ws2._gen_starts[0], ws._gen_starts[0])
    # the restored start batch completes the round on the next generate()
    ws2.generate()
    assert ws2.imag_replay_storage._num_episodes == 2 * cfg.gen_batch


def test_gif_oracles_written(tmp_path):
    """save_video=True dumps the reference's visual oracles: every 10th
    imagined episode -> imag_gif/ (reference train_metaworld_mbpo.py:193-202)
    and validate's GT|pred|error triptychs -> validate_gif/ (:226-243)."""
    cfg = _tiny_mbpo_cfg(start_mbpo=0, save_video=True, gen_pipeline=False)
    ws = Workspace(cfg, work_dir=str(tmp_path), env_fn=make_fake_env,
                   tok_cfg=TINY, lm_cfg=TINY_LM)
    ts = ws.train_env.reset()
    ws.replay_storage.add(ts)
    while not ts.last():
        ts = ws.train_env.step(ws.train_env.action_spec().generate_value())
        ws.replay_storage.add(ts)

    ws.generate()
    gifs = list((tmp_path / "imag_gif").glob("*.gif"))
    assert len(gifs) == 1  # gen_batch=2 -> only episode 0 hits i%10==0
    import imageio
    frames = imageio.mimread(gifs[0])
    assert len(frames) == cfg.gen_horizon + 1
    assert frames[0].shape[:2] == (32, 32)

    m = ws.validate(global_frame=0)
    assert np.isfinite(m["val/obs_mse"]) and np.isfinite(m["val/reward_mse"])
    val_gifs = list((tmp_path / "validate_gif").glob("val-sample-0-*.gif"))
    assert len(val_gifs) == cfg.wm_batch_size
    tript = imageio.mimread(val_gifs[0])[0]
    assert tript.shape[1] == 3 * 32  # GT | pred | error side by side


def test_demo_true_without_prefix_raises(tmp_path):
    cfg = _tiny_mbpo_cfg(demo=True)
    with pytest.raises(ValueError, match="demo_path_prefix"):
        Workspace(cfg, work_dir=str(tmp_path), env_fn=make_fake_env,
                  tok_cfg=TINY, lm_cfg=TINY_LM)
