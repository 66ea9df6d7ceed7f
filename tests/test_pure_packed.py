"""Packed 4:2:0 source uploads in the pure no-crop modes.

The reference's secondary flow (README: det_threshold=None ⇒ RRDB enhances
every image / BiSeNet groups the originals) feeds whole source images to
the models.  With packed uploads the plain-4:2:0 JPEG sources cross the
host→device link as their stored YCbCr planes (1.5 bytes/pixel) and the
enhancer/parser reconstruct RGB on device; JPEG-bound saves come back as
packed rows (enhancer) or write the stored samples straight through the
raw-data encoder (pass-through sources in parse mode).

Correctness bar: the device reconstruction is bit-identical to the host
numpy twin, so the packed paths must agree *exactly* with running the
same model on the host reconstruction; end-to-end outputs vs the
unpacked run are bounded by the usual ~1-level 4:2:0 reconstruction
difference on an already-JPEG-bound pipeline.
"""

import os

import numpy as np
import pytest

from face_crop_plus_tpu.ops.yuv import (
    packed_length,
    rgb_to_yuv420_np,
    yuv420_to_rgb_np,
)
from face_crop_plus_tpu.utils.io import PackedYUVImage, imread_rgb, imwrite
from face_crop_plus_tpu.utils.native_io import yuv_encoder_available

cv2 = pytest.importorskip("cv2")

needs_encoder = pytest.mark.skipif(
    not yuv_encoder_available(), reason="native YUV encoder unavailable"
)


def _natural_image(rng, h=64, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [(xx * 255 / w), (yy * 255 / h), ((xx + yy) * 255 / (h + w))], axis=-1
    )
    return np.clip(base + rng.normal(0, 8, (h, w, 3)), 0, 255).astype(np.uint8)


def _packed(rng, n, h, w):
    rgb = np.stack([_natural_image(rng, h, w) for _ in range(n)])
    return rgb_to_yuv420_np(rgb)


# ---------------------------------------------------------------------------
# Model-level parity: packed input == host reconstruction input, exactly
# ---------------------------------------------------------------------------


def test_parser_packed_input_matches_host_reconstruction():
    from face_crop_plus_tpu.models.parsing import BiSeNet

    rng = np.random.default_rng(11)
    h, w = 48, 64
    rows = _packed(rng, 3, h, w)
    with pytest.warns(UserWarning, match="random"):
        par = BiSeNet(
            attr_groups={"a": [1], "b": [-2]},
            mask_groups={"m": [1, 2]},
            max_batch_size=2,
        )
    par.attr_threshold = -1
    par.mask_threshold = -1

    ref_attr, ref_mask = par.predict(yuv420_to_rgb_np(rows, h, w))
    got_attr, got_mask = par.predict(rows, src_hw=(h, w))

    assert got_attr == ref_attr
    assert set(got_mask) == set(ref_mask)
    for k in ref_mask:
        assert got_mask[k][0] == ref_mask[k][0]
        assert np.array_equal(got_mask[k][1], ref_mask[k][1])


def test_enhancer_packed_input_matches_host_reconstruction():
    from face_crop_plus_tpu.models.enhancement import RRDBNet

    rng = np.random.default_rng(12)
    h, w = 24, 32
    rows = _packed(rng, 2, h, w)
    with pytest.warns(UserWarning, match="random"):
        enh = RRDBNet(min_face_factor=1.0)
    enh.num_blocks = 2
    enh.params = enh._init_fn()()

    ref = enh.enhance_images(yuv420_to_rgb_np(rows, h, w))
    got = enh.enhance_images(rows, src_hw=(h, w))
    assert np.array_equal(got, ref)

    # pack_out is exactly the device packing of the RGB result.
    packed_out = enh.enhance_images(rows, src_hw=(h, w), pack_out=True)
    assert packed_out.shape == (2, packed_length((w, h)))
    assert np.array_equal(packed_out, rgb_to_yuv420_np(ref))


def test_enhancer_predict_list_with_packed_entries():
    from face_crop_plus_tpu.models.enhancement import RRDBNet

    rng = np.random.default_rng(13)
    h, w = 24, 32
    rgb = np.stack([_natural_image(rng, h, w) for _ in range(2)])
    rows = rgb_to_yuv420_np(rgb)
    entries = [PackedYUVImage(rows[0], h, w), PackedYUVImage(rows[1], h, w)]
    with pytest.warns(UserWarning, match="random"):
        enh = RRDBNet(min_face_factor=1.0)
    enh.num_blocks = 2
    enh.params = enh._init_fn()()

    # No landmarks => everything is enhanced (reference rrdb.py:125-127).
    ref = enh.predict([yuv420_to_rgb_np(r, h, w) for r in rows], None, None)
    out = enh.predict(entries, None, None)
    assert all(isinstance(o, np.ndarray) for o in out)
    for o, r in zip(out, ref):
        assert np.array_equal(o, r)

    out_packed = enh.predict(entries, None, None, pack_out=True)
    assert all(isinstance(o, PackedYUVImage) for o in out_packed)
    for o, r in zip(out_packed, ref):
        assert np.array_equal(o.packed, rgb_to_yuv420_np(r[None])[0])

    with pytest.raises(ValueError, match="list input"):
        enh.predict(rgb, None, None, pack_out=True)


# ---------------------------------------------------------------------------
# Cropper-level: eligibility, save semantics, end-to-end parity
# ---------------------------------------------------------------------------


def _jpeg_dir(tmp_path, rng, n=3, h=48, w=48, name="imgs"):
    d = tmp_path / name
    d.mkdir()
    for i in range(n):
        imwrite(str(d / f"p{i}.jpg"), _natural_image(rng, h, w))
    return str(d)


@needs_encoder
def test_pure_mode_eligibility(tmp_path, monkeypatch):
    from face_crop_plus_tpu import Cropper

    monkeypatch.setenv("FCPT_PACK_UPLOAD", "1")
    with pytest.warns(UserWarning, match="random"):
        c = Cropper(det_threshold=None, enh_threshold=0.5, device="cpu")
    assert c._packed_upload_eligible()

    with pytest.warns(UserWarning, match="random"):
        c_par = Cropper(det_threshold=None, attr_groups={"g": [1]}, device="cpu")
    assert c_par._packed_upload_eligible()

    # Neither model: nothing consumes the upload; stays RGB.
    c_none = Cropper(det_threshold=None, enh_threshold=None, device="cpu")
    assert not c_none._packed_upload_eligible()

    # Precomputed landmarks need host RGB for the warp.
    lms = (np.zeros((1, 5, 2), np.float32), np.array(["p0.jpg"]))
    with pytest.warns(UserWarning, match="random"):
        c_lm = Cropper(
            det_threshold=None, enh_threshold=0.5, landmarks=lms, device="cpu"
        )
    assert not c_lm._packed_upload_eligible()


@needs_encoder
def test_save_group_packed_entry_jpeg_and_png(tmp_path):
    from face_crop_plus_tpu import Cropper

    rng = np.random.default_rng(14)
    h, w = 32, 48
    rgb = _natural_image(rng, h, w)
    rows = rgb_to_yuv420_np(rgb[None])
    entry = PackedYUVImage(rows[0], h, w)

    c = Cropper(det_threshold=None, enh_threshold=None, device="cpu")
    out = str(tmp_path / "jpg_out")
    c.save_group([entry], ["src.jpg"], out)
    # JPEG target: the stored samples go straight through the raw-data
    # encoder; decoding them back lands within JPEG quantization of the
    # reconstruction.
    dec = imread_rgb(os.path.join(out, "src.jpg"))
    assert dec.shape == (h, w, 3)
    recon = yuv420_to_rgb_np(rows, h, w)[0]
    assert np.abs(dec.astype(int) - recon.astype(int)).mean() < 3.0

    # Non-JPEG target: host reconstruction, lossless encode.
    c_png = Cropper(
        det_threshold=None, enh_threshold=None, device="cpu", output_format="png"
    )
    out2 = str(tmp_path / "png_out")
    c_png.save_group([entry], ["src.jpg"], out2)
    dec2 = imread_rgb(os.path.join(out2, "src.png"))
    assert np.array_equal(dec2, recon)


@needs_encoder
def test_pure_parse_e2e_packed_vs_rgb(tmp_path, monkeypatch):
    from face_crop_plus_tpu import Cropper

    rng = np.random.default_rng(15)
    src = _jpeg_dir(tmp_path, rng, n=4, h=48, w=48)
    monkeypatch.setenv("FCPT_PACK_FETCH", "0")

    def run(name, upload):
        monkeypatch.setenv("FCPT_PACK_UPLOAD", "1" if upload else "0")
        out = str(tmp_path / name)
        with pytest.warns(UserWarning, match="random"):
            c = Cropper(
                det_threshold=None,
                enh_threshold=None,
                attr_groups={"g": [1], "h": [-2]},
                mask_groups={"m": [1, 2]},
                device="cpu",
                batch_size=4,
            )
        c.par_model.attr_threshold = -1
        c.par_model.mask_threshold = -1
        c.process_dir(src, out, desc=None)
        return out

    out_rgb = run("rgb", False)
    out_pk = run("packed", True)

    def tree(root):
        return sorted(
            os.path.relpath(os.path.join(r, f), root)
            for r, _d, fs in os.walk(root)
            for f in fs
        )

    # Same groups, same membership (file tree identical).  With a -1
    # threshold membership is deterministic; the parse itself runs on
    # inputs that differ by <= ~1 level (device reconstruction vs full
    # libjpeg decode), so masks may disagree on a tiny pixel fraction.
    assert tree(out_rgb) == tree(out_pk)
    for rel in tree(out_rgb):
        a = imread_rgb(os.path.join(out_rgb, rel))
        b = imread_rgb(os.path.join(out_pk, rel))
        assert a.shape == b.shape
        if rel.split(os.sep)[-2].endswith("_mask"):
            assert (a != b).mean() < 0.02
        else:
            assert np.abs(a.astype(int) - b.astype(int)).mean() < 2.0


@needs_encoder
def test_pure_parse_packed_on_mesh(tmp_path, monkeypatch):
    """Packed pure-parse runs shard the (N, L) rows over the data axis."""
    import jax

    from face_crop_plus_tpu import Cropper
    from face_crop_plus_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)

    rng = np.random.default_rng(18)
    src = _jpeg_dir(tmp_path, rng, n=8, h=48, w=48)
    monkeypatch.setenv("FCPT_PACK_UPLOAD", "1")
    kwargs = dict(
        det_threshold=None,
        enh_threshold=None,
        attr_groups={"g": [1]},
        mask_groups={"m": [1, 2]},
        batch_size=8,
    )

    def run(name, **extra):
        out = str(tmp_path / name)
        with pytest.warns(UserWarning, match="random"):
            c = Cropper(**kwargs, **extra)
        c.par_model.attr_threshold = -1
        c.par_model.mask_threshold = -1
        assert c._packed_upload_eligible()
        c.process_dir(src, out, desc=None)
        return out

    out1 = run("single", device=jax.devices()[0])
    out2 = run("mesh", mesh=mesh)

    def tree(root):
        return sorted(
            os.path.relpath(os.path.join(r, f), root)
            for r, _d, fs in os.walk(root)
            for f in fs
        )

    assert tree(out1) == tree(out2)
    for rel in tree(out1):
        a = imread_rgb(os.path.join(out1, rel)).astype(int)
        b = imread_rgb(os.path.join(out2, rel)).astype(int)
        assert np.abs(a - b).max() <= 1, rel  # same math modulo partitioning


@needs_encoder
def test_pure_enhance_e2e_packed_vs_rgb(tmp_path, monkeypatch):
    from face_crop_plus_tpu import Cropper

    rng = np.random.default_rng(16)
    src = _jpeg_dir(tmp_path, rng, n=3, h=32, w=32)

    def run(name, upload):
        monkeypatch.setenv("FCPT_PACK_UPLOAD", "1" if upload else "0")
        out = str(tmp_path / name)
        with pytest.warns(UserWarning, match="random"):
            c = Cropper(
                det_threshold=None,
                enh_threshold=0.5,
                device="cpu",
                batch_size=4,
            )
        c.enh_model.num_blocks = 2
        c.enh_model.params = c.enh_model._init_fn()()
        c.process_dir(src, out, desc=None)
        return out

    out_rgb = run("rgb", False)
    out_pk = run("packed", True)

    assert sorted(os.listdir(out_rgb)) == sorted(os.listdir(out_pk))
    for f in os.listdir(out_rgb):
        a = imread_rgb(os.path.join(out_rgb, f))
        b = imread_rgb(os.path.join(out_pk, f))
        assert a.shape == b.shape
        # Packed run: reconstruction-input SR + packed-output encode vs
        # full-decode SR + cv2 encode; bounded by the two ~1-level stages.
        assert np.abs(a.astype(int) - b.astype(int)).mean() < 3.0
