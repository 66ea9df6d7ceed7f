"""YUV-direct landmark cropping (native/fcpt_io.cpp::fcpt_warp_yuv420).

The r5 fast path for the reference's flagship config (README.md:246-275,
precomputed landmarks): JPEG sources decode to stored 4:2:0 planes, faces
warp per plane (luma full-res, chroma on the half-res grid with a
color-neutral 128 constant border — the exact YCbCr image of an RGB black
border), and packed rows feed the raw-data encoder.  Full-size RGB never
materializes.  Parity vs the RGB path: luma within rounding; chroma
interpolates on the subsampled grid instead of upsample→warp→downsample,
bounded by the same ~1-level band the packed wire formats document.
"""

import os

import numpy as np
import pytest

from face_crop_plus_tpu.utils.native_io import (
    available,
    chroma_conjugate_affine,
    warp_affine_batch_native,
    warp_yuv420_available,
    warp_yuv420_batch_native,
    yuv_encoder_available,
)

pytestmark = pytest.mark.skipif(
    not (available() and warp_yuv420_available() and yuv_encoder_available()),
    reason="native library (r5 entry points) unavailable",
)


def _mats(rng, f):
    base = np.array([[0.8, 0.1, 5.0], [-0.1, 0.8, 8.0]], np.float32)
    out = np.stack([base * (1.0 + 0.07 * i) for i in range(f)])
    out[..., 2] += rng.uniform(-10, 10, (f, 2)).astype(np.float32)
    return out


def _packed(rng, n, h, w):
    return rng.integers(0, 255, (n, h * w + 2 * (h // 2) * (w // 2)), np.uint8)


# ---------------------------------------------------------------- kernels


def test_c1_c2_bit_identical_to_c3(rng):
    """The new AVX2 c==1/c==2 row kernels vs the proven c==3 kernel."""
    imgs = rng.integers(0, 255, (2, 70, 90, 3), dtype=np.uint8)
    mats = _mats(rng, 4)
    idx = np.array([0, 1, 0, 1], np.int32)
    # Odd output width exercises the scalar tail after the 8-px blocks.
    o3 = warp_affine_batch_native(imgs, mats, idx, (61, 53), exact=False)
    y1 = np.ascontiguousarray(imgs[..., :1])
    o1 = warp_affine_batch_native(y1, mats, idx, (61, 53), exact=False)
    assert np.array_equal(o1[..., 0], o3[..., 0])
    uv = np.ascontiguousarray(imgs[..., :2])
    o2 = warp_affine_batch_native(uv, mats, idx, (61, 53), exact=False)
    assert np.array_equal(o2, o3[..., :2])


@pytest.mark.parametrize("mode", ["constant", "replicate", "reflect", "wrap", "reflect_101"])
def test_c1_border_modes_match_c3(rng, mode):
    imgs = rng.integers(0, 255, (1, 40, 44, 3), dtype=np.uint8)
    mats = _mats(rng, 3) * 1.8  # push samples outside the frame
    idx = np.zeros(3, np.int32)
    o3 = warp_affine_batch_native(imgs, mats, idx, (32, 32), mode, exact=False)
    y1 = np.ascontiguousarray(imgs[..., :1])
    o1 = warp_affine_batch_native(y1, mats, idx, (32, 32), mode, exact=False)
    assert np.array_equal(o1[..., 0], o3[..., 0])


def test_c1_fixed_vs_exact_one_level(rng):
    imgs = rng.integers(0, 255, (1, 64, 64, 1), dtype=np.uint8)
    mats = _mats(rng, 2)
    idx = np.zeros(2, np.int32)
    fixed = warp_affine_batch_native(imgs, mats, idx, (48, 48), exact=False)
    exact = warp_affine_batch_native(imgs, mats, idx, (48, 48), exact=True)
    assert np.abs(fixed.astype(int) - exact.astype(int)).max() <= 1


def test_border_value_fill_and_blend(rng):
    imgs = rng.integers(0, 255, (1, 16, 16, 2), dtype=np.uint8)
    far = np.array([[[1, 0, 1000], [0, 1, 1000]]], np.float32)
    idx = np.zeros(1, np.int32)
    out = warp_affine_batch_native(
        imgs, far, idx, (8, 8), exact=False, border_value=(128, 77)
    )
    assert (out[..., 0] == 128).all() and (out[..., 1] == 77).all()
    # Partial blend at a known half-in half-out sample: the forward map
    # p_dst = p_src + 0.5 sends dst (0, 0) to src (-0.5, 0) -> taps x=-1
    # (outside, weight .5) and x=0 (inside, .5).
    half = np.array([[[1, 0, 0.5], [0, 1, 0]]], np.float32)
    out = warp_affine_batch_native(
        imgs, half, idx, (4, 4), exact=True, border_value=(200, 0)
    )
    want = np.rint(0.5 * imgs[0, 0, 0].astype(float) + 0.5 * np.array([200, 0]))
    assert np.array_equal(out[0, 0, 0], want.astype(np.uint8))


def test_border_value_requires_new_binary(monkeypatch, rng):
    from face_crop_plus_tpu.utils import native_io

    lib = native_io.load_library()
    monkeypatch.setattr(lib, "_has_native_warp_bv", False, raising=False)
    imgs = rng.integers(0, 255, (1, 8, 8, 1), dtype=np.uint8)
    out = warp_affine_batch_native(
        imgs, _mats(rng, 1), np.zeros(1, np.int32), (4, 4), border_value=(128,)
    )
    assert out is None
    assert not warp_yuv420_available()


# ------------------------------------------------------------ fused warp


def test_warp_yuv420_identity_bit_exact(rng):
    h, w = 34, 46
    packed = _packed(rng, 3, h, w)
    eye = np.tile(np.array([[[1, 0, 0], [0, 1, 0]]], np.float32), (3, 1, 1))
    idx = np.arange(3, dtype=np.int32)
    out = warp_yuv420_batch_native(packed, (h, w), eye, idx, (w, h))
    assert np.array_equal(out, packed)


def test_warp_yuv420_matches_per_plane_composition(rng):
    h, w = 62, 58
    packed = _packed(rng, 2, h, w)
    mats = _mats(rng, 4)
    idx = np.array([0, 1, 1, 0], np.int32)
    out = warp_yuv420_batch_native(packed, (h, w), mats, idx, (48, 40))
    ylen, clen = h * w, (h // 2) * (w // 2)
    y = np.ascontiguousarray(packed[:, :ylen].reshape(2, h, w, 1))
    cb = np.ascontiguousarray(packed[:, ylen : ylen + clen].reshape(2, h // 2, w // 2, 1))
    cr = np.ascontiguousarray(packed[:, ylen + clen :].reshape(2, h // 2, w // 2, 1))
    wy = warp_affine_batch_native(y, mats, idx, (48, 40), exact=False)
    mc = chroma_conjugate_affine(mats)
    wcb = warp_affine_batch_native(cb, mc, idx, (24, 20), exact=False, border_value=(128,))
    wcr = warp_affine_batch_native(cr, mc, idx, (24, 20), exact=False, border_value=(128,))
    comp = np.concatenate(
        [wy.reshape(4, -1), wcb.reshape(4, -1), wcr.reshape(4, -1)], axis=1
    )
    assert np.array_equal(out, comp)


def test_warp_yuv420_validation(rng):
    packed = _packed(rng, 1, 16, 16)
    m = _mats(rng, 1)
    idx = np.zeros(1, np.int32)
    assert warp_yuv420_batch_native(packed, (16, 16), m, idx, (15, 16)) is None
    assert warp_yuv420_batch_native(packed, (15, 16), m, idx, (16, 16)) is None
    assert warp_yuv420_batch_native(packed[:, :-1], (16, 16), m, idx, (16, 16)) is None
    out = warp_yuv420_batch_native(
        packed, (16, 16), np.zeros((0, 2, 3), np.float32), np.zeros(0, np.int32), (8, 8)
    )
    assert out.shape == (0, 8 * 8 + 2 * 16)
    # Invalid source index: black luma, neutral chroma.
    out = warp_yuv420_batch_native(packed, (16, 16), m, np.array([5], np.int32), (8, 8))
    assert (out[0, :64] == 0).all() and (out[0, 64:] == 128).all()


def test_chroma_conjugate_identity_and_inverse_commute(rng):
    eye = np.array([[[1, 0, 0], [0, 1, 0]]], np.float32)
    assert np.allclose(chroma_conjugate_affine(eye), eye)
    from face_crop_plus_tpu.utils.native_io import _invert_affine_np

    m = _mats(rng, 3)
    a = chroma_conjugate_affine(_invert_affine_np(m))
    b = _invert_affine_np(chroma_conjugate_affine(m))
    assert np.allclose(a, b, atol=1e-4)


def test_chroma_conjugate_scale_translate():
    # Full-res 2x upscale about the origin: chroma sample (i, j) sits at
    # full-res (2i+.5); mapping through p'=2p gives q' = 2q + 0.25.
    m = np.array([[[2, 0, 0], [0, 2, 0]]], np.float32)
    mc = chroma_conjugate_affine(m)
    assert np.allclose(mc[0], [[2, 0, 0.25], [0, 2, 0.25]])


# ------------------------------------------------------------ cropper e2e


def _write_sources(tmp_path, rng, n=5, hw=(218, 178)):
    import cv2

    from face_crop_plus_tpu.utils.io import imwrite

    src_dir = tmp_path / "src"
    src_dir.mkdir(exist_ok=True)
    for i in range(n):
        im = rng.integers(0, 255, hw + (3,), dtype=np.uint8)
        im = cv2.GaussianBlur(im, (15, 15), 5)
        imwrite(str(src_dir / f"{i:03d}.jpg"), im)
    lm = tmp_path / "lm.txt"
    rows = []
    for i in range(n):
        pts = [69, 112, 108, 112, 88, 134, 72, 154, 104, 154]
        pts = [p + (i * 3) % 7 for p in pts]
        rows.append(f"{i:03d}.jpg " + " ".join(map(str, pts)))
    lm.write_text("\n".join(rows) + "\n")
    return str(src_dir), str(lm)


def _run(tmp_path, lm, src_dir, knob, name, **kw):
    from face_crop_plus_tpu import Cropper

    out = tmp_path / name
    os.environ["FCPT_YUV_CROP"] = knob
    try:
        c = Cropper(
            landmarks=lm,
            output_size=(256, 256),
            det_threshold=None,
            num_processes=1,
            **kw,
        )
        c.process_dir(src_dir, str(out))
    finally:
        os.environ.pop("FCPT_YUV_CROP", None)
    return out


def test_cropper_yuv_vs_rgb_tree(tmp_path, rng):
    from face_crop_plus_tpu.utils.io import imread_rgb

    src_dir, lm = _write_sources(tmp_path, rng)
    a = _run(tmp_path, lm, src_dir, "1", "yuv")
    b = _run(tmp_path, lm, src_dir, "0", "rgb")
    names_a = sorted(os.listdir(a))
    assert names_a == sorted(os.listdir(b)) and len(names_a) == 5
    for n in names_a:
        x = imread_rgb(str(a / n)).astype(int)
        y = imread_rgb(str(b / n)).astype(int)
        d = np.abs(x - y)
        assert d.mean() < 1.0 and d.max() <= 8, n


def test_cropper_yuv_mixed_png_source(tmp_path, rng):
    """Non-4:2:0 sources in the same batch keep the RGB path, exactly."""
    import cv2

    from face_crop_plus_tpu.utils.io import imread_rgb, imwrite

    src_dir, lm = _write_sources(tmp_path, rng, n=3)
    im = cv2.GaussianBlur(
        rng.integers(0, 255, (218, 178, 3), dtype=np.uint8), (15, 15), 5
    )
    imwrite(os.path.join(src_dir, "p.png"), im)
    with open(lm, "a") as f:
        f.write("p.png 69 112 108 112 88 134 72 154 104 154\n")
    a = _run(tmp_path, lm, src_dir, "1", "yuv")
    b = _run(tmp_path, lm, src_dir, "0", "rgb")
    assert sorted(os.listdir(a)) == sorted(os.listdir(b))
    assert "p.png" in os.listdir(a)
    x = imread_rgb(str(a / "p.png"))
    y = imread_rgb(str(b / "p.png"))
    assert np.array_equal(x, y)  # PNG crop never entered YUV space


def test_cropper_yuv_strategy_all_multirow(tmp_path, rng):
    from face_crop_plus_tpu.utils.io import imread_rgb

    src_dir, lm = _write_sources(tmp_path, rng, n=2)
    with open(lm, "a") as f:  # second face for source 0
        f.write("000.jpg 72 115 111 115 91 137 75 157 107 157\n")
    a = _run(tmp_path, lm, src_dir, "1", "yuv", strategy="all")
    b = _run(tmp_path, lm, src_dir, "0", "rgb", strategy="all")
    names = sorted(os.listdir(a))
    assert names == sorted(os.listdir(b)) and "000_1.jpg" in names
    for n in names:
        d = np.abs(
            imread_rgb(str(a / n)).astype(int) - imread_rgb(str(b / n)).astype(int)
        )
        assert d.mean() < 1.0 and d.max() <= 8, n


def test_detection_host_crop_yuv_rows_tree(tmp_path, rng, monkeypatch):
    """Detection-mode twin: host-crop + packed uploads warp straight from
    the stored planes into packed rows (no RGB reconstruction); tree parity
    with the r4 reconstruct-then-RGB-warp path within the documented band.
    """
    import cv2

    from face_crop_plus_tpu import Cropper
    from face_crop_plus_tpu.utils.io import imread_rgb, imwrite

    d = tmp_path / "src"
    d.mkdir()
    for i in range(6):
        im = rng.integers(0, 255, (64, 60, 3), dtype=np.uint8)
        imwrite(str(d / f"{i}.jpg"), cv2.GaussianBlur(im, (11, 11), 4))
    monkeypatch.setenv("FCPT_PACK_UPLOAD", "1")
    monkeypatch.setenv("FCPT_HOST_CROP", "1")
    trees = {}
    for knob in ("1", "0"):
        monkeypatch.setenv("FCPT_YUV_CROP", knob)
        out = tmp_path / f"out{knob}"
        c = Cropper(
            output_size=32, resize_size=64, det_threshold=0.6, batch_size=4,
            device="cpu", num_processes=1,
        )
        c.det_model.vis_threshold = -1.0
        c.det_model.auto_grow = False
        c.det_model._cap_warned = True
        assert c._host_yuv_rows_ok([f"{i}.jpg" for i in range(6)]) == (knob == "1")
        c.process_dir(str(d), str(out), desc=None)
        trees[knob] = {
            f: imread_rgb(str(out / f)).astype(int) for f in os.listdir(out)
        }
    assert set(trees["1"]) == set(trees["0"]) and trees["1"]
    for name in trees["1"]:
        diff = np.abs(trees["1"][name] - trees["0"][name])
        assert diff.mean() < 1.0 and diff.max() <= 8, name


def test_host_yuv_rows_gates(tmp_path, rng):
    from face_crop_plus_tpu import Cropper

    c = Cropper(
        output_size=32, det_threshold=0.6, device="cpu", num_processes=1
    )
    assert c._host_yuv_rows_ok(["a.jpg"])
    assert not c._host_yuv_rows_ok(["a.png"])  # non-JPEG output in batch
    c2 = Cropper(
        output_size=(33, 32), det_threshold=0.6, device="cpu", num_processes=1
    )
    assert not c2._host_yuv_rows_ok(["a.jpg"])  # odd output width


def test_yuv_eligibility_gates(tmp_path, rng):
    from face_crop_plus_tpu import Cropper

    src_dir, lm = _write_sources(tmp_path, rng, n=1)

    def gate(**kw):
        return Cropper(
            landmarks=lm, det_threshold=None, num_processes=1, **kw
        )._yuv_crop_eligible()

    assert gate(output_size=(256, 256))
    assert not gate(output_size=(255, 256))  # odd output dims
    assert not gate(output_size=(256, 256), output_format="png")
    os.environ["FCPT_YUV_CROP"] = "0"
    try:
        assert not gate(output_size=(256, 256))
    finally:
        os.environ.pop("FCPT_YUV_CROP", None)
    os.environ["FCPT_WARP_EXACT"] = "1"
    try:
        assert not gate(output_size=(256, 256))
    finally:
        os.environ.pop("FCPT_WARP_EXACT", None)
    # Detection mode never takes the YUV-direct path.
    from face_crop_plus_tpu import Cropper as C

    c = C.__new__(C)
    c.landmarks = None
    assert not C._yuv_crop_eligible(c)
