"""Model-free DrQ-v2 workspace smoke (reference mbrl/train_metaworld_drq.py):
seed phase -> agent updates -> episode logging -> snapshot, on a fake env."""

import numpy as np
import pytest

from ivideogpt_tpu.mbrl.drq_workspace import DrQConfig, DrQWorkspace
from tests.test_mbpo_workspace import make_fake_env


@pytest.mark.slow
def test_drq_workspace_smoke(tmp_path):
    cfg = DrQConfig(
        num_train_frames=80, num_seed_frames=40, num_expl_steps=20,
        action_repeat=2, eval_every_frames=10**9, num_eval_episodes=1,
        batch_size=8, nstep=1, duration=12, save_video=False,
        save_snapshot=True, use_tb=False, replay_buffer_num_workers=1,
        agent_update_times=1, stddev_schedule="0.2", feature_dim=16,
        hidden_dim=32)
    ws = DrQWorkspace(cfg, work_dir=str(tmp_path), env_fn=make_fake_env)
    ws.train()
    assert ws.global_step == 40
    assert len(list((tmp_path / "buffer").glob("*.npz"))) >= 2
    assert (tmp_path / "snapshot.pkl").exists()

    # resume restores counters as of the last episode-boundary snapshot
    ws2 = DrQWorkspace(cfg, work_dir=str(tmp_path), env_fn=make_fake_env)
    ws2.load_snapshot()
    assert 0 < ws2.global_step <= ws.global_step
    assert ws2._global_episode == ws._global_episode

    # eval runs and logs
    ws2.eval()
    assert (tmp_path / "eval.csv").exists()
