"""Data layer tests: segment sampling modes, augmentation, mixtures,
eval split, metrics."""

import os

import numpy as np
import pytest

from ivideogpt_tpu.data import augment
from ivideogpt_tpu.data.npz_dataset import (MixRoboticDataset, RoboticDataset,
                                            get_base_stepsize,
                                            get_display_key)


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    for name in ("cmu_stretch", "bridge"):
        d = root / name
        d.mkdir()
        for i in range(105):  # >100 so the 1% eval split is non-empty
            T = int(rng.integers(12, 30))
            np.savez_compressed(
                d / f"episode_{i:04d}.npz",
                image=rng.integers(0, 255, (T, 48, 64, 3)).astype(np.uint8),
                action=rng.uniform(-1, 1, (T, 4)).astype(np.float32))
    return str(root)


def test_stepsize_and_display_tables():
    assert get_base_stepsize("fractal20220817_data") == 3
    assert get_base_stepsize("unknown_dataset") == 1
    assert get_display_key("bair_robot_pushing") == "aux1_image"
    assert get_display_key("unknown_dataset") == "image"


def test_train_eval_split(data_root):
    tr = RoboticDataset(data_root, "cmu_stretch", segment_length=4, train=True)
    ev = RoboticDataset(data_root, "cmu_stretch", segment_length=4, train=False)
    assert tr.size + ev.size == 105
    assert ev.size == 2  # every 100th episode (indices 0 and 100)


@pytest.mark.parametrize("mode", ["contiguous", "random_selection",
                                  "random_shuffle", "goal"])
def test_segment_modes(data_root, mode):
    kw = dict(segment_length=6, context_length=2, image_size=32,
              no_aug=True, seed=1)
    if mode == "random_selection":
        kw.update(random_selection=True, segment_horizon=8)
    elif mode == "random_shuffle":
        kw.update(random_shuffle=True, segment_horizon=8)
    elif mode == "goal":
        kw.update(goal_conditioned=True)
    ds = RoboticDataset(data_root, "cmu_stretch", **kw)
    seg = ds.sample()
    assert seg.shape == (6, 32, 32, 3)
    assert seg.dtype == np.float32
    assert 0.0 <= seg.min() and seg.max() <= 1.0


def test_segment_with_actions(data_root):
    ds = RoboticDataset(data_root, "cmu_stretch", segment_length=5,
                        image_size=32, no_aug=True, load_action=True)
    seg, act = ds.sample()
    assert seg.shape == (5, 32, 32, 3)
    assert act.shape == (5, 4)


def test_augmentation_shared_params(data_root):
    ds = RoboticDataset(
        data_root, "cmu_stretch", segment_length=4, image_size=32,
        random_resized_crop_scale=(0.8, 1.0),
        random_resized_crop_ratio=(0.9, 1.1),
        brightness=(0.9, 1.1), contrast=(0.9, 1.1),
        saturation=(0.9, 1.1), hue=(-0.03, 0.03), seed=3)
    seg = ds.sample()
    assert seg.shape == (4, 32, 32, 3)
    assert np.isfinite(seg).all()


def test_mixture_weights(data_root):
    mix = MixRoboticDataset(data_root, [("cmu_stretch", 0.5), ("bridge", 0.5)],
                            segment_length=4, image_size=32, no_aug=True)
    for _ in range(3):
        assert mix.sample().shape == (4, 32, 32, 3)


def test_color_jitter_formulas():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    np.testing.assert_allclose(augment.adjust_brightness(img, 1.0), img,
                               atol=1e-6)
    dark = augment.adjust_brightness(img, 0.5)
    np.testing.assert_allclose(dark, img * 0.5, atol=1e-6)
    # contrast 0 collapses to the grayscale mean
    flat = augment.adjust_contrast(img, 0.0)
    assert flat.std() < 1e-5
    # hue shift of 0 is identity (up to colorspace roundtrip)
    same = augment.adjust_hue(img, 0.0)
    np.testing.assert_allclose(same, img, atol=1e-4)


def test_video_metrics_best_of_t():
    import jax.numpy as jnp
    from ivideogpt_tpu.utils.video_metric import best_of_t_metrics, psnr, ssim

    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(0, 1, (2, 3, 32, 32, 3)), jnp.float32)
    # 2 samples per clip: one exact, one noisy -> best-of-t picks the exact one
    noisy = jnp.clip(gt + 0.2 * jnp.asarray(
        rng.normal(size=gt.shape), jnp.float32), 0, 1)
    gen = jnp.concatenate([gt, noisy], axis=0)
    m = best_of_t_metrics(gt, gen)
    assert float(m["mse"]) < 1e-10
    assert float(m["psnr"]) > 70
    assert float(m["ssim"]) > 0.999


def test_feature_stats_and_frechet():
    from ivideogpt_tpu.utils.video_metric import FeatureStats, frechet_distance
    rng = np.random.default_rng(0)
    a, b = FeatureStats(), FeatureStats()
    x = rng.normal(size=(500, 16)).astype(np.float32)
    for i in range(0, 500, 100):
        a.append(x[i:i + 100])
        b.append(x[i:i + 100])
    assert a.num_items == 500
    # identical stats -> FVD ~ 0
    assert abs(frechet_distance(a, b)) < 1e-6
    c = FeatureStats()
    c.append(rng.normal(loc=2.0, size=(500, 16)).astype(np.float32))
    assert frechet_distance(a, c) > 1.0


# ---------------------------------------------------------------------------
# SSv2 frame-folder loader (reference sthsth_dataloader.py:209-306)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def sthsth_root(tmp_path_factory):
    """Synthesized SSv2 layout: jpg frame folders + [id nframes label] list
    files (the reference's 20bn-something-something-v2-frames layout)."""
    from PIL import Image
    root = tmp_path_factory.mktemp("sthsth")
    frames_root = root / "frames"
    list_dir = root / "lists"
    list_dir.mkdir()
    rng = np.random.default_rng(0)
    # (video_id, num_frames, label): two selected-label videos, one
    # excluded label, one too short to survive the min-length filter
    videos = [("10001", 12, "86"), ("10002", 20, "1"),
              ("10003", 12, "2"), ("10004", 3, "86")]
    rows = []
    for vid, n, label in videos:
        d = frames_root / vid
        d.mkdir(parents=True)
        for i in range(1, n + 1):  # image_tmpl is 1-based {:06d}.jpg
            # constant-valued frame = frame-index watermark that survives
            # JPEG compression and resize exactly enough to assert ordering
            arr = np.full((24, 32, 3), i * 10, np.uint8)
            Image.fromarray(arr).save(d / f"{i:06d}.jpg", quality=95)
        rows.append(f"{vid} {n} {label}")
    (list_dir / "train_video_folder.txt").write_text("\n".join(rows) + "\n")
    (list_dir / "val_video_folder.txt").write_text(rows[1] + "\n")
    return frames_root, list_dir


def test_sthsth_label_and_length_filter(sthsth_root):
    from ivideogpt_tpu.data.sthsth_dataset import SomethingV2Dataset
    frames_root, list_dir = sthsth_root
    ds = SomethingV2Dataset(
        str(frames_root), segment_length=8, list_dir=str(list_dir),
        train=True, manual_labels=True, image_size=32, seed=0)
    # label "2" is not in the manual subset; the 3-frame video is too short
    assert {v.path for v in ds.video_list} == {"10001", "10002"}
    # without the manual filter only the length gate applies
    ds_all = SomethingV2Dataset(
        str(frames_root), segment_length=8, list_dir=str(list_dir),
        train=True, manual_labels=False, image_size=32, seed=0)
    assert {v.path for v in ds_all.video_list} == {"10001", "10002", "10003"}


def test_sthsth_sample_shapes_and_values(sthsth_root):
    from ivideogpt_tpu.data.sthsth_dataset import SomethingV2Dataset
    frames_root, list_dir = sthsth_root
    ds = SomethingV2Dataset(
        str(frames_root), segment_length=8, list_dir=str(list_dir),
        train=True, image_size=32, seed=1)
    x = ds.sample()
    assert x.shape == (8, 32, 32, 3)
    assert x.dtype == np.float32
    assert 0.0 <= x.min() and x.max() <= 1.0
    # consecutive frames in a contiguous segment carry watermarks rising by
    # ~10/255 per frame (stepsize 1, 1-based jpg naming honored)
    marks = [float(np.median(f)) * 255 for f in x]
    assert all(8 < b - a < 12 for a, b in zip(marks, marks[1:])), marks


def test_sthsth_random_selection_mode(sthsth_root):
    from ivideogpt_tpu.data.sthsth_dataset import SomethingV2Dataset
    frames_root, list_dir = sthsth_root
    ds = SomethingV2Dataset(
        str(frames_root), segment_length=6, context_length=1,
        segment_horizon=10, random_selection=True, list_dir=str(list_dir),
        train=True, image_size=32, seed=2)
    x = ds.sample()
    assert x.shape == (6, 32, 32, 3)
    # rand-select keeps temporal order after the context frames
    marks = [float(np.median(f)) * 255 for f in x]
    assert all(b - a > 2 for a, b in zip(marks, marks[1:])), marks


def test_sthsth_val_split(sthsth_root):
    from ivideogpt_tpu.data.sthsth_dataset import SomethingV2Dataset
    frames_root, list_dir = sthsth_root
    ds = SomethingV2Dataset(
        str(frames_root), segment_length=8, list_dir=str(list_dir),
        train=False, image_size=32, seed=0)
    assert [v.path for v in ds.video_list] == ["10002"]


def test_eval_loader_drop_last():
    """drop_last yields only full batches — required when batches feed the
    sharded global_batch (ragged tails break data-axis divisibility)."""
    from ivideogpt_tpu.data.npz_dataset import EvalDataLoader

    class _StubSet:
        def __len__(self):
            return 7

        def __getitem__(self, i):
            return np.full((2, 4, 4, 3), i, np.float32)

    loader = EvalDataLoader.__new__(EvalDataLoader)
    loader.dataset, loader.batch_size, loader.drop_last = _StubSet(), 3, True
    batches = list(loader)
    assert len(loader) == 2 and len(batches) == 2
    assert all(b.shape[0] == 3 for b in batches)

    ragged = EvalDataLoader.__new__(EvalDataLoader)
    ragged.dataset, ragged.batch_size, ragged.drop_last = _StubSet(), 3, False
    tails = [b.shape[0] for b in ragged]
    assert tails == [3, 3, 1] and len(ragged) == 3
