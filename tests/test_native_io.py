"""Tests for the native (C++/libjpeg) batch decoder and its integration."""

import os

import numpy as np
import pytest

from face_crop_plus_tpu.utils import native_io
from face_crop_plus_tpu.utils.io import imread_rgb, imwrite, read_images

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native io library not built"
)


@pytest.fixture()
def jpg_dir(tmp_path, rng):
    d = tmp_path / "jpgs"
    d.mkdir()
    for i, (h, w) in enumerate([(120, 160), (600, 800), (64, 48)]):
        # Smooth content (random noise is a JPEG worst case and makes
        # decoder-difference comparisons meaningless).
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.stack(
            [128 + 90 * np.sin(xx / 19), 128 + 90 * np.cos(yy / 13), xx % 255],
            axis=-1,
        ).astype(np.uint8)
        imwrite(str(d / f"im{i}.jpg"), img)
    return str(d)


def test_decode_matches_reference_decoder(jpg_dir):
    p = os.path.join(jpg_dir, "im0.jpg")
    a = native_io.decode_jpeg(p)
    b = imread_rgb(p)
    assert a.shape == b.shape
    # Fast-DCT decode differs slightly from cv2's; must stay close.
    assert np.abs(a.astype(int) - b.astype(int)).mean() < 3.0


def test_jpeg_dims_header_only(jpg_dir):
    assert native_io.jpeg_dims(os.path.join(jpg_dir, "im1.jpg")) == (600, 800)


def test_scaled_decode(jpg_dir):
    p = os.path.join(jpg_dir, "im1.jpg")
    s = native_io.decode_jpeg(p, scale_denom=4)
    assert s.shape == (150, 200, 3)


def test_decode_batch_and_failures(jpg_dir, tmp_path):
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not a jpeg")
    paths = [
        os.path.join(jpg_dir, "im0.jpg"),
        str(bad),
        os.path.join(jpg_dir, "im2.jpg"),
        str(tmp_path / "missing.jpg"),
    ]
    out = native_io.decode_batch(paths, n_threads=4)
    assert out[0] is not None and out[2] is not None
    assert out[1] is None and out[3] is None


def test_pick_scale_denom():
    assert native_io.pick_scale_denom((8000, 6000), 1024) == 4
    assert native_io.pick_scale_denom((2048, 2048), 1024) == 2
    assert native_io.pick_scale_denom((1500, 1000), 1024) == 1
    assert native_io.pick_scale_denom((9000, 9000), 1024) == 8


def test_read_images_uses_native_with_target(jpg_dir):
    imgs, names = read_images(
        sorted(os.listdir(jpg_dir)), jpg_dir, target_max=128
    )
    assert len(imgs) == 3
    # The 600x800 image decodes at reduced scale (>=128 on the long side).
    shapes = {n: im.shape for n, im in zip(names, imgs)}
    assert shapes["im1.jpg"][0] < 600
    assert max(shapes["im1.jpg"][:2]) >= 128
    # Small images stay at native size.
    assert shapes["im2.jpg"][:2] == (64, 48)


def test_read_images_fallback_for_png(tmp_path, rng):
    d = tmp_path / "mixed"
    d.mkdir()
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    imwrite(str(d / "a.png"), img)
    imwrite(str(d / "b.jpg"), img)
    imgs, names = read_images(["a.png", "b.jpg"], str(d))
    assert len(imgs) == 2
    np.testing.assert_array_equal(imgs[0], img)  # png path is lossless


def test_host_tag_mismatch_forces_rebuild(tmp_path, monkeypatch):
    """A foreign/unknown host tag forces a -B rebuild and rewrites the tag.

    The library is compiled -march=native; make's mtime check cannot catch
    a newer-than-source binary built on a different host (rsync'd checkout),
    which would SIGILL at the first call.
    """
    import subprocess

    tag = native_io._host_tag()
    assert ":" in tag and len(tag) > 8

    # Simulate a foreign binary: plant a mismatching tag, reset the
    # once-per-process latches, and record the make invocation.
    monkeypatch.setattr(native_io, "_lib", None)
    monkeypatch.setattr(native_io, "_build_attempted", False)
    calls = []
    orig_run = subprocess.run

    def spy(cmd, **kw):
        calls.append(list(cmd))
        return orig_run(cmd, **kw)

    monkeypatch.setattr(subprocess, "run", spy)
    with open(native_io._TAG_PATH, "w") as f:
        f.write("foreign:0000000000000000")
    lib = native_io.load_library()
    assert lib is not None
    assert calls and "-B" in calls[0]  # forced rebuild, not an mtime no-op
    assert native_io._read_tag() == tag  # tag rewritten for this host

    # Fresh tag + fresh state: plain (no -B) make.
    monkeypatch.setattr(native_io, "_lib", None)
    monkeypatch.setattr(native_io, "_build_attempted", False)
    calls.clear()
    assert native_io.load_library() is not None
    assert calls and "-B" not in calls[0]
