"""Seed the replay buffers from the REAL reference demonstration episodes
(read-only data at /root/reference/mbrl/demonstrations/<task>/*.npz — the
files the reference's `demo: true` path preloads, reference
replay_buffer.py:105-112, train_metaworld_mbpo.py:84). They are stored
torch channel-FIRST (L, 9, 64, 64) uint8; this framework is NHWC, so
load_episode transposes them (`_obs_to_nhwc`). Skipped when the reference
tree is absent."""

import os
from pathlib import Path

import numpy as np
import pytest

from ivideogpt_tpu.mbrl.replay_buffer import (ReplayBuffer,
                                              ReplaySegmentBuffer,
                                              _obs_to_nhwc, load_episode)

DEMO_ROOT = "/root/reference/mbrl/demonstrations"
TASK = os.path.join(DEMO_ROOT, "coffee-push")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TASK), reason="reference demonstrations not available")


def test_load_episode_transposes_reference_layout():
    fn = sorted(Path(TASK).glob("*.npz"))[0]
    ep = load_episode(fn)
    obs = ep["observation"]
    # L+1=101 timesteps (dummy first transition), 3-frame stack, NHWC
    assert obs.shape == (101, 64, 64, 9) and obs.dtype == np.uint8
    assert ep["action"].shape == (101, 4)
    assert ep["reward"].shape == (101, 1)
    assert ep["discount"].shape == (101, 1)
    # the transpose must be the exact inverse of torch's channel-first view
    raw = {k: np.load(fn)[k] for k in ("observation",)}["observation"]
    np.testing.assert_array_equal(obs, np.transpose(raw, (0, 2, 3, 1)))
    # real pixels, not garbage: a frame has spatial variation
    assert obs[50, ..., -3:].std() > 1.0


def test_obs_to_nhwc_leaves_native_layout_alone():
    ours = np.zeros((11, 8, 8, 9), np.uint8)  # tiny NHWC test episode
    assert _obs_to_nhwc(ours).shape == (11, 8, 8, 9)
    theirs = np.zeros((11, 9, 64, 64), np.uint8)
    assert _obs_to_nhwc(theirs).shape == (11, 64, 64, 9)
    # frame_stack=5 NHWC with tiny square frames: both axes look like
    # channels -> the equal (spatial) pair disambiguates
    five = np.zeros((11, 12, 12, 15), np.uint8)
    assert _obs_to_nhwc(five).shape == (11, 12, 12, 15)
    five_cf = np.zeros((11, 15, 12, 12), np.uint8)
    assert _obs_to_nhwc(five_cf).shape == (11, 12, 12, 15)
    # non-image 4-D data (no channel-like axis) passes through untouched
    raw = np.zeros((11, 40, 50, 70), np.float32)
    assert _obs_to_nhwc(raw).shape == (11, 40, 50, 70)
    # NHWC whose height is channel-plausible but spatial pair is in the
    # NHWC slots: must NOT transpose (the review's corruption case)
    hwc = np.zeros((11, 24, 24, 36), np.uint8)
    assert _obs_to_nhwc(hwc).shape == (11, 24, 24, 36)
    # ...even when the last axis is not channel-like at all
    odd = np.zeros((11, 24, 50, 70), np.float32)
    assert _obs_to_nhwc(odd).shape == (11, 24, 50, 70)
    # fully ambiguous cube stays put (our own storage is NHWC)
    cube = np.zeros((11, 9, 9, 9), np.uint8)
    assert _obs_to_nhwc(cube).shape == (11, 9, 9, 9)


def test_nstep_buffer_preloads_real_demos(tmp_path):
    buf = ReplayBuffer(tmp_path, max_size=10_000, nstep=3, discount=0.99,
                       demo_path=TASK, seed=0)
    # 5 demo episodes x 100 steps each
    assert buf._size == 500 and len(buf._episode_fns) == 5
    obs, action, reward, discount, next_obs = buf.sample()
    assert obs.shape == (64, 64, 9) and obs.dtype == np.uint8
    assert next_obs.shape == (64, 64, 9)
    assert action.shape == (4,) and action.dtype == np.float32
    assert reward.shape == (1,) and discount.shape == (1,)
    assert 0.0 <= float(discount[0]) <= 0.99 ** 3 + 1e-6


def test_segment_buffer_slices_last_frame_of_stack(tmp_path):
    seg = 12
    buf = ReplaySegmentBuffer(tmp_path, max_size=10_000, nstep=3,
                              discount=0.99, demo_path=TASK, seed=0,
                              segment_length=seg)
    obs, action, reward = buf.sample()
    # last frame of the 3-frame stack only (world-model segments)
    assert obs.shape == (seg, 64, 64, 3) and obs.dtype == np.uint8
    assert action.shape == (seg, 4) and reward.shape == (seg, 1)
    assert obs.std() > 1.0  # a real clip, not a constant block
