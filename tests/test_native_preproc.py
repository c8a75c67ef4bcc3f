"""Native (C++/ctypes) fused segment preprocessing vs the cv2 oracle.

Builds ``native/libsegment_ops.so`` with the repo's build script (g++ is in
the image) and checks the fused crop+bilinear+normalize kernel against the
float cv2 path it replaces (``augment.resized_crop`` on img/255) — same
half-pixel-center bilinear convention, so agreement is tight.
Reference behavior being mirrored: the torchvision RandomResizedCrop host
loop (reference ivideogpt/data/simple_dataloader.py segment preprocessing).
"""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def native_lib():
    so = os.path.join(REPO, "native", "libsegment_ops.so")
    if not os.path.exists(so):
        r = subprocess.run(["bash", os.path.join(REPO, "native", "build.sh")],
                           capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"native build failed: {r.stderr[-500:]}")
    from ivideogpt_tpu.data import native
    # force a re-probe in case an earlier import cached the miss
    native._TRIED = False
    native._LIB = None
    if not native.available():
        pytest.skip("libsegment_ops.so not loadable")
    return native


def test_fused_crop_resize_matches_cv2(native_lib):
    from ivideogpt_tpu.data.augment import resized_crop
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (3, 96, 128, 3), np.uint8)
    i, j, h, w = 7, 11, 80, 100
    size = 64
    fused = native_lib.segment_crop_resize(images, i, j, h, w, size)
    assert fused is not None and fused.shape == (3, size, size, 3)
    for t in range(images.shape[0]):
        ref = resized_crop(images[t].astype(np.float32) / 255.0,
                           i, j, h, w, size)
        np.testing.assert_allclose(fused[t], ref, atol=2e-6)


def test_fused_identity_crop_full_frame(native_lib):
    # crop == full frame, output == input size: pure normalize path
    rng = np.random.default_rng(1)
    images = rng.integers(0, 256, (2, 64, 64, 3), np.uint8)
    fused = native_lib.segment_crop_resize(images, 0, 0, 64, 64, 64)
    np.testing.assert_allclose(
        fused, images.astype(np.float32) / 255.0, atol=1e-6)


def test_augment_segment_native_path(native_lib, monkeypatch):
    # the loader-facing entry honors IVG_NATIVE_PREPROC=1 and matches the
    # cv2 fallback bit-for-float on the same RNG draw
    from ivideogpt_tpu.data.augment import augment_segment
    rng_img = np.random.default_rng(2)
    images = rng_img.integers(0, 256, (4, 72, 72, 3), np.uint8)
    kw = dict(image_size=64, crop_scale=(0.8, 1.0), crop_ratio=(0.9, 1.1),
              brightness=(0.9, 1.1), contrast=(0.9, 1.1),
              saturation=(0.9, 1.1), hue=(-0.02, 0.02))
    monkeypatch.delenv("IVG_NATIVE_PREPROC", raising=False)
    ref = augment_segment(images, rng=np.random.default_rng(5), **kw)
    monkeypatch.setenv("IVG_NATIVE_PREPROC", "1")
    out = augment_segment(images, rng=np.random.default_rng(5), **kw)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=3e-5)
