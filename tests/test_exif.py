"""EXIF orientation parity: native libjpeg decode vs cv2's auto-orient."""

import os

import numpy as np
import pytest

from face_crop_plus_tpu.utils.io import (
    apply_exif_orientation,
    imread_rgb,
    jpeg_exif_orientation,
    read_images,
)

PIL = pytest.importorskip("PIL.Image")


def _write_oriented_jpeg(path, img, orientation):
    im = PIL.fromarray(img)
    exif = PIL.Exif()
    exif[0x0112] = orientation
    im.save(path, quality=95, exif=exif.tobytes())


@pytest.mark.parametrize("orientation", [1, 2, 3, 4, 5, 6, 7, 8])
def test_jpeg_exif_orientation_parse(tmp_path, rng, orientation):
    img = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    p = str(tmp_path / "x.jpg")
    _write_oriented_jpeg(p, img, orientation)
    assert jpeg_exif_orientation(p) == orientation


def test_jpeg_without_exif_is_orientation_1(tmp_path, rng):
    img = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    p = str(tmp_path / "x.jpg")
    PIL.fromarray(img).save(p, quality=95)
    assert jpeg_exif_orientation(p) == 1
    assert jpeg_exif_orientation(str(tmp_path / "missing.jpg")) == 1


@pytest.mark.parametrize("orientation", [2, 3, 4, 5, 6, 7, 8])
def test_apply_orientation_matches_pil_transpose(rng, orientation):
    from PIL import Image

    # The transpose PIL's ImageOps.exif_transpose applies per orientation.
    ops = {
        2: Image.FLIP_LEFT_RIGHT,
        3: Image.ROTATE_180,
        4: Image.FLIP_TOP_BOTTOM,
        5: Image.TRANSPOSE,
        6: Image.ROTATE_270,
        7: Image.TRANSVERSE,
        8: Image.ROTATE_90,
    }
    img = rng.integers(0, 255, (10, 14, 3), dtype=np.uint8)
    want = np.asarray(PIL.fromarray(img).transpose(ops[orientation]))
    got = apply_exif_orientation(img, orientation)
    np.testing.assert_array_equal(got, want)


def test_read_images_native_matches_cv2_for_oriented_jpeg(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    from face_crop_plus_tpu.utils import native_io

    if not native_io.available():
        pytest.skip("native decoder unavailable")

    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    p = str(tmp_path / "rot.jpg")
    _write_oriented_jpeg(p, img, 6)

    images, names = read_images(["rot.jpg"], str(tmp_path))
    assert list(names) == ["rot.jpg"]
    want = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
    assert images[0].shape == want.shape  # rotated: (64, 48, 3)
    d = np.abs(images[0].astype(int) - want.astype(int))
    assert d.mean() < 1.0


def test_packed_read_prefilters_rotated_files(tmp_path, rng, monkeypatch):
    """EXIF-rotated JPEGs never enter the packed 4:2:0 decode.

    The orientation probe is a header scan and runs BEFORE the full
    decode, so a rotated file is entropy-decoded exactly once (on the RGB
    path) instead of packed-decoded, discarded, and decoded again.
    """
    cv2 = pytest.importorskip("cv2")
    from face_crop_plus_tpu.utils import native_io
    from face_crop_plus_tpu.utils.io import PackedYUVImage

    if not native_io.yuv_encoder_available():
        pytest.skip("native YUV decoder unavailable")

    from face_crop_plus_tpu.utils.io import imwrite

    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    _write_oriented_jpeg(str(tmp_path / "rot.jpg"), img, 6)
    imwrite(str(tmp_path / "up.jpg"), img)  # cv2 default: 4:2:0, no EXIF

    packed_calls = []
    orig = native_io.decode_yuv420_batch

    def spy(paths, scale_denom=1, n_threads=8):
        packed_calls.extend(os.path.basename(p) for p in paths)
        return orig(paths, scale_denom=scale_denom, n_threads=n_threads)

    monkeypatch.setattr(native_io, "decode_yuv420_batch", spy)
    images, names = read_images(
        ["rot.jpg", "up.jpg"], str(tmp_path), want_packed=True
    )
    assert list(names) == ["rot.jpg", "up.jpg"]
    # The rotated file never reached the packed decoder...
    assert packed_calls == ["up.jpg"]
    # ...and still decodes upright via the RGB path.
    assert not isinstance(images[0], PackedYUVImage)
    assert images[0].shape == (64, 48, 3)
    assert isinstance(images[1], PackedYUVImage)


def test_orientation_found_after_large_appn_segment(tmp_path, rng):
    """APP1 sitting beyond 64 KB of APPn (ICC/XMP-style) is still found."""
    img = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    p = str(tmp_path / "x.jpg")
    _write_oriented_jpeg(p, img, 6)
    with open(p, "rb") as f:
        data = f.read()
    # Splice a 64 KB APP2 (e.g. a fat ICC profile chunk) before the APP1.
    app1 = data.index(b"\xff\xe1")
    fat = b"\xff\xe2" + (65534).to_bytes(2, "big") + b"\x00" * 65532
    with open(p, "wb") as f:
        f.write(data[:app1] + fat + data[app1:])
    assert jpeg_exif_orientation(p) == 6


def test_orientation_after_xmp_app1(tmp_path, rng):
    """A non-Exif APP1 (XMP) before the Exif APP1 is skipped, not mistaken."""
    img = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    p = str(tmp_path / "x.jpg")
    _write_oriented_jpeg(p, img, 8)
    with open(p, "rb") as f:
        data = f.read()
    app1 = data.index(b"\xff\xe1")
    xmp_payload = b"http://ns.adobe.com/xap/1.0/\x00" + b"<x/>" * 16
    xmp = b"\xff\xe1" + (len(xmp_payload) + 2).to_bytes(2, "big") + xmp_payload
    with open(p, "wb") as f:
        f.write(data[:app1] + xmp + data[app1:])
    assert jpeg_exif_orientation(p) == 8


def test_orientation_long_typed_entry(tmp_path):
    """Writers emitting the orientation as a LONG (type 4) are honored."""
    import struct

    # Hand-build a minimal JPEG: SOI + Exif APP1 (one LONG orientation
    # entry) + EOI; the parser never needs a scan to read the header.
    tiff = b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
    tiff += struct.pack("<H", 1)  # one IFD entry
    tiff += struct.pack("<HHI", 0x0112, 4, 1) + struct.pack("<I", 3)
    tiff += struct.pack("<I", 0)  # next-IFD offset
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload
    p = str(tmp_path / "x.jpg")
    with open(p, "wb") as f:
        f.write(b"\xff\xd8" + app1 + b"\xff\xd9")
    assert jpeg_exif_orientation(p) == 3
