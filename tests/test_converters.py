"""Dataset-converter tests with synthetic source files (the real corpora
cannot live in CI, but the container has tensorflow/h5py/cv2, so the
converters run end to end on manufactured inputs; reference contracts:
datasets/preprocess_bair.py:46-80, preprocess_vp2.py:8-31,
preprocess_robonet.py:14-91)."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

tf = pytest.importorskip("tensorflow")
h5py = pytest.importorskip("h5py")


def _load(mod):
    # the repo's datasets/ dir is not a package (and "datasets" collides
    # with the HF pip package) — load the tool by path
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f"ivg_{mod}", os.path.join(REPO, "datasets", f"{mod}.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.mark.slow
def test_bair_tfrecord_converter(tmp_path):
    convert_split = _load("preprocess_bair").convert_split

    rng = np.random.default_rng(0)
    split_dir = tmp_path / "in" / "test"
    split_dir.mkdir(parents=True)
    mains = rng.integers(0, 255, (2, 30, 64, 64, 3)).astype(np.uint8)
    auxs = rng.integers(0, 255, (2, 30, 64, 64, 3)).astype(np.uint8)
    acts = rng.uniform(-1, 1, (2, 30, 4)).astype(np.float32)

    path = str(split_dir / "traj_1_to_2.tfrecords")
    with tf.io.TFRecordWriter(path) as w:
        for tr in range(2):
            feat = {}
            for i in range(30):
                feat[f"{i}/image_main/encoded"] = tf.train.Feature(
                    bytes_list=tf.train.BytesList(
                        value=[mains[tr, i].tobytes()]))
                feat[f"{i}/image_aux1/encoded"] = tf.train.Feature(
                    bytes_list=tf.train.BytesList(
                        value=[auxs[tr, i].tobytes()]))
                feat[f"{i}/action"] = tf.train.Feature(
                    float_list=tf.train.FloatList(value=acts[tr, i].tolist()))
            w.write(tf.train.Example(
                features=tf.train.Features(feature=feat)).SerializeToString())

    out = tmp_path / "out"
    n = convert_split(str(tmp_path / "in"), str(out), "test")
    assert n == 2
    files = sorted((out / "test").glob("*.npz"))
    assert len(files) == 2
    with np.load(files[0]) as ep:
        np.testing.assert_array_equal(ep["image"], mains[0])
        np.testing.assert_array_equal(ep["aux1_image"], auxs[0])
        np.testing.assert_allclose(ep["action"], acts[0], rtol=1e-6)


@pytest.mark.slow
def test_vp2_h5_converter(tmp_path):
    load_and_convert = _load("preprocess_vp2").load_and_convert

    rng = np.random.default_rng(1)
    obs = rng.integers(0, 255, (3, 8, 64, 64, 3)).astype(np.uint8)
    acts = rng.uniform(-1, 1, (3, 8, 5)).astype(np.float32)
    h5_path = str(tmp_path / "demos.hdf5")
    with h5py.File(h5_path, "w") as hf:
        hf.create_dataset("mask/train",
                          data=np.array([b"demo_0", b"demo_2"]))
        hf.create_dataset("mask/valid", data=np.array([b"demo_1"]))
        for d in range(3):
            hf.create_dataset(f"data/demo_{d}/obs/camera_image", data=obs[d])
            hf.create_dataset(f"data/demo_{d}/actions", data=acts[d])

    save = tmp_path / "robodesk_out"
    save.mkdir()
    load_and_convert(h5_path, str(save), mode="train")
    files = sorted(save.glob("*.npz"))
    assert [f.name for f in files] == ["train_eps_demo_00000.npz",
                                       "train_eps_demo_00002.npz"]
    with np.load(files[1]) as ep:
        np.testing.assert_array_equal(ep["image"], obs[2])
        np.testing.assert_allclose(ep["action"], acts[2], rtol=1e-6)

    load_and_convert(h5_path, str(save), mode="valid")
    assert (save / "validation_eps_demo_00001.npz").exists()


@pytest.mark.slow
def test_robonet_jpg_converter_pieces(tmp_path):
    """load_camera_imgs (jpg path) + 4->5-dim autograsp action synthesis."""
    import cv2
    rn = _load("preprocess_robonet")
    load_actions, load_camera_imgs = rn.load_actions, rn.load_camera_imgs

    rng = np.random.default_rng(2)
    T, H, W = 5, 48, 64
    # smooth gradients: random noise is pathological for JPEG
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    frames = np.stack([
        np.stack([(xx / W) * 255, (yy / H) * 255,
                  np.full_like(xx, 40 * t)], -1)
        for t in range(T)]).astype(np.uint8)
    h5_path = str(tmp_path / "traj.hdf5")
    with h5py.File(h5_path, "w") as hf:
        for t in range(T):
            ok, enc = cv2.imencode(".jpg", frames[t][..., ::-1])
            assert ok
            hf.create_dataset(f"env/cam0_video/frame{t}",
                              data=np.frombuffer(enc.tobytes(), np.uint8))
        hf.create_dataset("policy/actions",
                          data=rng.uniform(-1, 1, (T - 1, 4)).astype(np.float64))
        hf.create_dataset("env/state",
                          data=rng.uniform(-1, 1, (T, 5)).astype(np.float64))

    meta = {"frame_dim": (H, W), "img_T": T, "img_encoding": "jpg",
            "image_format": "RGB", "action_T": T - 1, "adim": 4,
            "primitives": "autograsp", "high_bound": [1] * 5,
            "low_bound": [-1] * 5, "sdim": 5}
    with h5py.File(h5_path, "r") as hf:
        imgs = load_camera_imgs(0, hf, meta)
        acts = load_actions(hf, meta)
    assert imgs.shape == (T, H, W, 3)
    # jpg is lossy; content must be close, not exact
    assert float(np.mean(np.abs(imgs.astype(int) - frames.astype(int)))) < 20
    assert acts.shape == (T - 1, 5)
