"""Device-packed YCbCr 4:2:0 crop fetches + native raw-data JPEG encode.

The packing is the JPEG encoder's lossy front half executed on device
(ops/yuv.py) so JPEG-bound crops cross the device→host link at half the
bytes; the host feeds the planes straight into libjpeg's raw-data API
(native/fcpt_io.cpp).  Correctness bar: files must be interchangeable
with the raw path's ``cv2.imwrite`` JPEGs (same quality, same 4:2:0
sampling, pixel deltas bounded by rounding-order differences on the
already-lossy stages).
"""

import os

import numpy as np
import pytest

from face_crop_plus_tpu.ops.yuv import (
    packed_length,
    rgb_to_yuv420,
    rgb_to_yuv420_np,
    unpack_yuv420,
)
from face_crop_plus_tpu.utils.io import imwrite, imwrite_yuv420
from face_crop_plus_tpu.utils.native_io import (
    encode_jpeg_yuv420_batch,
    yuv_encoder_available,
)

cv2 = pytest.importorskip("cv2")

needs_encoder = pytest.mark.skipif(
    not yuv_encoder_available(), reason="native YUV encoder unavailable"
)


def _natural_image(rng, h=64, w=64):
    """Smooth gradient + noise: JPEG-friendly, unlike pure noise."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 / w),
            (yy * 255 / h),
            ((xx + yy) * 255 / (h + w)),
        ],
        axis=-1,
    )
    noisy = base + rng.normal(0, 8, (h, w, 3))
    return np.clip(noisy, 0, 255).astype(np.uint8)


def test_pack_matches_numpy_twin(rng):
    crops = rng.integers(0, 256, (3, 32, 48, 3), dtype=np.uint8)
    pj = np.asarray(rgb_to_yuv420(crops))
    pn = rgb_to_yuv420_np(crops)
    assert pj.shape == (3, packed_length((48, 32)))
    assert np.array_equal(pj, pn)


def test_native_reconstruct_matches_numpy_twin(rng):
    """The C++ YUV420→RGB must be bit-identical to the numpy/device twin.

    The host-crop packed path warps this reconstruction; any float-order
    or fp-contract drift would silently widen the crop parity band.
    """
    from face_crop_plus_tpu.ops.yuv import rgb_to_yuv420_np, yuv420_to_rgb_np
    from face_crop_plus_tpu.utils.native_io import (
        available,
        yuv420_to_rgb_native,
    )

    if not available():
        pytest.skip("native library unavailable")
    for h, w in [(64, 60), (2, 2), (34, 178)]:
        imgs = rng.integers(0, 255, (5, h, w, 3), np.uint8)
        packed = rgb_to_yuv420_np(imgs)
        got = yuv420_to_rgb_native(packed, h, w)
        if got is None:
            pytest.skip("stale native binary without fcpt_yuv420_to_rgb")
        np.testing.assert_array_equal(got, yuv420_to_rgb_np(packed, h, w))
    # single-row squeeze contract + odd-dims rejection
    one = rgb_to_yuv420_np(rng.integers(0, 255, (1, 64, 60, 3), np.uint8))[0]
    got = yuv420_to_rgb_native(one, 64, 60)
    assert got.shape == (64, 60, 3)
    assert yuv420_to_rgb_native(one, 63, 60) is None


def test_pack_plane_semantics(rng):
    # A constant-color image maps to constant Y/Cb/Cr at the BT.601 values.
    crop = np.full((1, 16, 16, 3), 0, np.uint8)
    crop[..., 0] = 255  # pure red
    y, cb, cr = unpack_yuv420(rgb_to_yuv420_np(crop), (16, 16))
    assert np.all(y == 76)  # rint(0.299*255)
    assert np.all(cb == 85)  # rint(128 - 0.168736*255)
    assert np.all(cr == 255)  # rint(128 + 0.5*255) saturates
    # Grayscale input: chroma planes sit exactly at 128.
    gray = np.full((1, 16, 16, 3), 77, np.uint8)
    y2, cb2, cr2 = unpack_yuv420(rgb_to_yuv420_np(gray), (16, 16))
    assert np.all(y2 == 77) and np.all(cb2 == 128) and np.all(cr2 == 128)


@needs_encoder
def test_encode_matches_cv2_jpeg(tmp_path, rng):
    rgb = _natural_image(rng)
    packed = rgb_to_yuv420_np(rgb[None])[0]
    ours = str(tmp_path / "ours.jpg")
    theirs = str(tmp_path / "theirs.jpg")
    assert imwrite_yuv420(ours, packed, (64, 64))
    assert imwrite(theirs, rgb)

    dec_ours = cv2.cvtColor(cv2.imread(ours), cv2.COLOR_BGR2RGB).astype(int)
    dec_cv2 = cv2.cvtColor(cv2.imread(theirs), cv2.COLOR_BGR2RGB).astype(int)
    diff = np.abs(dec_ours - dec_cv2)
    # Same quality + sampling; only rounding-order differences on the
    # lossy stages remain.
    assert diff.mean() < 1.5
    assert diff.max() <= 16
    # And both stay close to the original pixels.
    err = np.abs(dec_ours - rgb.astype(int))
    assert err.mean() < 6.0


@needs_encoder
def test_encode_odd_width_padding(tmp_path, rng):
    # 50x38: exercises the MCU-padding staging path (w % 16 != 0).
    rgb = _natural_image(rng, h=38, w=50)
    packed = rgb_to_yuv420_np(rgb[None])[0]
    path = str(tmp_path / "pad.jpg")
    assert imwrite_yuv420(path, packed, (50, 38))
    dec = cv2.imread(path)
    assert dec.shape == (38, 50, 3)
    err = np.abs(
        cv2.cvtColor(dec, cv2.COLOR_BGR2RGB).astype(int) - rgb.astype(int)
    )
    assert err.mean() < 6.0


@needs_encoder
def test_encode_rejects_odd_dims(tmp_path, rng):
    rgb = _natural_image(rng, h=15, w=16)
    bad = np.zeros(15 * 16 + 2 * 7 * 8, np.uint8)
    assert not imwrite_yuv420(str(tmp_path / "odd.jpg"), bad, (16, 15))
    # wrong packed length
    assert not imwrite_yuv420(
        str(tmp_path / "short.jpg"), bad[:-1], (16, 16)
    )


@needs_encoder
def test_encode_batch(tmp_path, rng):
    crops = np.stack([_natural_image(rng) for _ in range(5)])
    packed = rgb_to_yuv420_np(crops)
    paths = [str(tmp_path / f"b{i}.jpg") for i in range(5)]
    oks = encode_jpeg_yuv420_batch(paths, packed, (64, 64), n_threads=2)
    assert oks == [True] * 5
    for i, p in enumerate(paths):
        dec = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB).astype(int)
        assert np.abs(dec - crops[i].astype(int)).mean() < 6.0


class TestPackedUpload:
    """JPEG → stored 4:2:0 planes → device-side RGB reconstruction."""

    @needs_encoder
    def test_decode_reconstruct_matches_cv2(self, tmp_path, rng):
        from face_crop_plus_tpu.ops.yuv import yuv420_to_rgb, yuv420_to_rgb_np
        from face_crop_plus_tpu.utils.native_io import decode_jpeg_yuv420

        rgb = _natural_image(rng, 64, 80)
        path = str(tmp_path / "src.jpg")
        assert imwrite(path, rgb)
        res = decode_jpeg_yuv420(path)
        assert res is not None
        packed, h, w = res
        assert (h, w) == (64, 80)
        assert packed.size == h * w + 2 * (h // 2) * (w // 2)

        rec = yuv420_to_rgb_np(packed, h, w)
        ref = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        diff = np.abs(rec.astype(int) - ref.astype(int))
        # Same stored samples; float triangle upsample + BT.601 inverse vs
        # libjpeg's fixed-point "fancy" path: rounding-order only.
        assert diff.mean() < 0.6
        assert diff.max() <= 2

        dev = np.asarray(yuv420_to_rgb(np.asarray(packed)[None], h, w))[0]
        assert np.array_equal(dev, rec)

    @needs_encoder
    def test_decode_falls_back_for_non_420(self, tmp_path, rng):
        from face_crop_plus_tpu.utils.native_io import (
            decode_jpeg_yuv420,
            decode_yuv420_batch,
        )

        rgb = _natural_image(rng)
        gray = str(tmp_path / "gray.jpg")
        cv2.imwrite(gray, cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY))
        assert decode_jpeg_yuv420(gray) is None
        ok = str(tmp_path / "ok.jpg")
        assert imwrite(ok, rgb)
        res = decode_yuv420_batch([gray, ok, str(tmp_path / "missing.jpg")])
        assert res[0] is None and res[2] is None
        assert res[1] is not None and res[1][1:] == (64, 64)

    @needs_encoder
    def test_read_images_want_packed(self, tmp_path, rng):
        from face_crop_plus_tpu.utils.io import (
            PackedYUVImage,
            read_images,
            unpack_images,
        )

        d = tmp_path / "mix"
        d.mkdir()
        rgb = _natural_image(rng, 32, 48)
        imwrite(str(d / "a.jpg"), rgb)
        imwrite(str(d / "b.png"), rgb)
        images, names = read_images(
            ["a.jpg", "b.png"], str(d), want_packed=True
        )
        assert list(names) == ["a.jpg", "b.png"]
        assert isinstance(images[0], PackedYUVImage)
        assert images[0].shape == (32, 48, 3)
        assert images[0].group_key == ("yuv420", 32, 48)
        assert isinstance(images[1], np.ndarray)
        plain = unpack_images(images)
        assert all(isinstance(im, np.ndarray) for im in plain)
        # Reconstruction stays within JPEG distance of the original.
        assert np.abs(plain[0].astype(int) - rgb.astype(int)).mean() < 6.0

    @needs_encoder
    def test_e2e_packed_upload_equals_rgb_upload(self, tmp_path,
                                                 monkeypatch):
        from face_crop_plus_tpu import Cropper
        import face_crop_plus_tpu.cropper as cropper_mod
        from face_crop_plus_tpu.utils.io import PackedYUVImage
        rng = np.random.default_rng(42)

        d = tmp_path / "imgs"
        d.mkdir()
        for i in range(4):
            imwrite(str(d / f"pic_{i}.jpg"), _natural_image(rng, 120, 160))

        monkeypatch.setenv("FCPT_PACK_FETCH", "0")

        def run(name, upload):
            monkeypatch.setenv("FCPT_PACK_UPLOAD", "1" if upload else "0")
            out = str(tmp_path / name)
            with pytest.warns(UserWarning, match="random"):
                c = Cropper(
                    output_size=64,
                    resize_size=128,
                    det_threshold=-1.0,
                    enh_threshold=None,
                    device="cpu",
                    batch_size=4,
                    strategy="largest",
                )
            c.det_model.vis_threshold = -1.0
            c.process_dir(str(d), out, desc=None)
            return out, c

        seen = {"packed": 0}
        orig = cropper_mod.read_images

        def spy(names, directory, target_max=None, n_threads=8,
                want_packed=False):
            imgs, kept = orig(
                names, directory, target_max, n_threads, want_packed
            )
            seen["packed"] += sum(
                isinstance(im, PackedYUVImage) for im in imgs
            )
            return imgs, kept

        monkeypatch.setattr(cropper_mod, "read_images", spy)
        up_dir, c = run("up", True)
        assert c._packed_upload_eligible()
        assert seen["packed"] == 4  # every source uploaded packed
        rgb_dir, _ = run("rgb", False)

        files = sorted(os.listdir(up_dir))
        assert files == sorted(os.listdir(rgb_dir))
        assert files == [f"pic_{i}.jpg" for i in range(4)]
        for f in files:
            a = cv2.imread(os.path.join(up_dir, f)).astype(int)
            b = cv2.imread(os.path.join(rgb_dir, f)).astype(int)
            # Device reconstruction is within ~1 level of the host decode;
            # crops from the two paths stay within JPEG-rounding distance.
            assert np.abs(a - b).mean() < 2.0

    @needs_encoder
    def test_e2e_packed_upload_strategy_all(self, tmp_path,
                                            monkeypatch):
        """Two-program "all" path warps from the device reconstruction."""
        from face_crop_plus_tpu import Cropper
        rng = np.random.default_rng(42)

        d = tmp_path / "imgs"
        d.mkdir()
        for i in range(4):
            imwrite(str(d / f"pic_{i}.jpg"), _natural_image(rng, 120, 160))
        monkeypatch.setenv("FCPT_PACK_FETCH", "0")

        def run(name, upload):
            monkeypatch.setenv("FCPT_PACK_UPLOAD", "1" if upload else "0")
            out = str(tmp_path / name)
            with pytest.warns(UserWarning, match="random"):
                c = Cropper(
                    output_size=64,
                    resize_size=128,
                    det_threshold=-1.0,
                    enh_threshold=None,
                    device="cpu",
                    batch_size=4,
                    strategy="all",
                )
            c.det_model.vis_threshold = -1.0
            c.process_dir(str(d), out, desc=None)
            return out, c

        up_dir, c = run("up_all", True)
        assert c._packed_upload_eligible()
        rgb_dir, _ = run("rgb_all", False)
        files = sorted(os.listdir(up_dir))
        assert files == sorted(os.listdir(rgb_dir)) and files
        for f in files:
            a = cv2.imread(os.path.join(up_dir, f)).astype(int)
            b = cv2.imread(os.path.join(rgb_dir, f)).astype(int)
            assert np.abs(a - b).mean() < 2.0

    @needs_encoder
    @pytest.mark.parametrize("gate_all", [False, True])
    def test_pipeline_packed_upload_enhanced(self, tmp_path, gate_all):
        """Enhancement-active packed uploads equal the RGB-upload path.

        Both variants feed the same reconstruction (the device unpack is
        bit-identical to the numpy twin), so crops agree modulo program
        fusion rounding — for the all-gated case via the SR trunk, for the
        none-gated case via plain warps from the device-resident
        reconstruction (the new ``_run_detect_interim_packed`` output).
        """
        from face_crop_plus_tpu import Cropper
        from face_crop_plus_tpu.ops.yuv import yuv420_to_rgb_np
        from face_crop_plus_tpu.utils.native_io import decode_jpeg_yuv420

        rng = np.random.default_rng(42)

        d = tmp_path / "imgs"
        d.mkdir()
        paths = []
        for i in range(4):
            p = str(d / f"pic_{i}.jpg")
            imwrite(p, _natural_image(rng, 120, 160))
            paths.append(p)
        packed = np.stack([decode_jpeg_yuv420(p)[0] for p in paths])
        rgb = np.stack(
            [yuv420_to_rgb_np(row, 120, 160) for row in packed]
        )

        with pytest.warns(UserWarning, match="random"):
            c = Cropper(
                output_size=64,
                resize_size=128,
                det_threshold=-1.0,
                enh_threshold=0.01,
                device="cpu",
                batch_size=4,
            )
        c.det_model.vis_threshold = -1.0
        # Gate every image (face factors are <= 1) or none (they are > 0).
        c.enh_model.min_face_factor = 1.0 if gate_all else 0.0

        crops_r, lm_r, idx_r = c._fused.process(rgb, (128, 128))
        crops_p, lm_p, idx_p = c._fused.process(
            packed, (128, 128), packed_hw=(120, 160)
        )
        assert np.array_equal(idx_r, idx_p)
        assert len(crops_r) and len(crops_r) == len(crops_p)
        assert np.allclose(lm_r, lm_p, atol=1e-3)
        diff = np.abs(crops_r.astype(int) - crops_p.astype(int))
        # Identical inputs through two jit programs: rounding-order only
        # (the all-gated case runs the random-weight SR trunk, which can
        # amplify a one-level interim difference at clip boundaries).
        assert diff.mean() < (1.0 if gate_all else 0.1)

    @needs_encoder
    def test_e2e_packed_upload_enhanced(self, tmp_path, monkeypatch):
        """process_dir engages packed uploads with enhancement active."""
        from face_crop_plus_tpu import Cropper
        rng = np.random.default_rng(42)
        import face_crop_plus_tpu.cropper as cropper_mod
        from face_crop_plus_tpu.utils.io import PackedYUVImage

        d = tmp_path / "imgs"
        d.mkdir()
        for i in range(4):
            imwrite(str(d / f"pic_{i}.jpg"), _natural_image(rng, 120, 160))
        monkeypatch.setenv("FCPT_PACK_FETCH", "0")

        def run(name, upload):
            monkeypatch.setenv("FCPT_PACK_UPLOAD", "1" if upload else "0")
            out = str(tmp_path / name)
            with pytest.warns(UserWarning, match="random"):
                c = Cropper(
                    output_size=64,
                    resize_size=128,
                    det_threshold=-1.0,
                    enh_threshold=0.01,
                    device="cpu",
                    batch_size=4,
                )
            c.det_model.vis_threshold = -1.0
            c.enh_model.min_face_factor = 0.0  # none gated: plain crops
            c.process_dir(str(d), out, desc=None)
            return out, c

        seen = {"packed": 0}
        orig = cropper_mod.read_images

        def spy(names, directory, target_max=None, n_threads=8,
                want_packed=False):
            imgs, kept = orig(
                names, directory, target_max, n_threads, want_packed
            )
            seen["packed"] += sum(
                isinstance(im, PackedYUVImage) for im in imgs
            )
            return imgs, kept

        monkeypatch.setattr(cropper_mod, "read_images", spy)
        up_dir, c = run("up_enh", True)
        assert c._packed_upload_eligible()
        assert seen["packed"] == 4
        rgb_dir, _ = run("rgb_enh", False)
        files = sorted(os.listdir(up_dir))
        assert files == sorted(os.listdir(rgb_dir)) and files
        for f in files:
            a = cv2.imread(os.path.join(up_dir, f)).astype(int)
            b = cv2.imread(os.path.join(rgb_dir, f)).astype(int)
            assert np.abs(a - b).mean() < 2.0

    def test_gate_rejects_unsupported_configs(self, tmp_path, monkeypatch):
        from face_crop_plus_tpu import Cropper

        monkeypatch.setenv("FCPT_PACK_UPLOAD", "1")
        if yuv_encoder_available():
            # Enhancement-active pipelines are packed-upload eligible (the
            # gated interim and the plain-crop reconstruction both stay on
            # device).
            with pytest.warns(UserWarning, match="random"):
                c_enh = Cropper(
                    output_size=64,
                    resize_size=128,
                    det_threshold=-1.0,
                    enh_threshold=0.01,
                    device="cpu",
                )
            assert c_enh._packed_upload_eligible()
        with pytest.warns(UserWarning, match="random"):
            c_int = Cropper(
                output_size=64,
                resize_size=128,
                det_threshold=-1.0,
                enh_threshold=None,
                device="cpu",
                crop_source="interim",
            )
        assert not c_int._packed_upload_eligible()
        monkeypatch.delenv("FCPT_PACK_UPLOAD", raising=False)
        with pytest.warns(UserWarning, match="random"):
            c_cpu = Cropper(
                output_size=64,
                resize_size=128,
                det_threshold=-1.0,
                enh_threshold=None,
                device="cpu",
            )
        assert not c_cpu._packed_upload_eligible()  # auto: off on CPU


class TestPackedFetchE2E:
    """Detection-mode process_dir with packed fetches forced on (CPU).

    Packed crop fetches exist to shrink the device→host link, so they
    apply only on the device-warp path; the host-crop mode (r4) would
    sidestep them entirely (host crops never cross the link) — pin it
    off for every test in this class.
    """

    @pytest.fixture(autouse=True)
    def _device_crop_path(self, monkeypatch):
        monkeypatch.setenv("FCPT_HOST_CROP", "0")

    @pytest.fixture()
    def jpeg_dir(self, tmp_path):
        # Own seeded generator, NOT the session rng: with random detector
        # weights a different suite order would change the images, and an
        # unlucky draw hits the degenerate-transform host fallback — the
        # packed-writer engagement assertions below would then be vacuous
        # (same order-dependence class STATUS r3 fixed for packed uploads).
        gen = np.random.default_rng(2024)
        d = tmp_path / "imgs"
        d.mkdir()
        for i in range(4):
            imwrite(str(d / f"pic_{i}.jpg"), _natural_image(gen, 120, 160))
        return str(d)

    def _run(self, tmp_path, jpeg_dir, name, **kw):
        from face_crop_plus_tpu import Cropper

        out_dir = str(tmp_path / name)
        with pytest.warns(UserWarning, match="random"):
            cropper = Cropper(
                output_size=64,
                resize_size=128,
                det_threshold=-1.0,
                enh_threshold=None,
                device="cpu",
                batch_size=4,
                **kw,
            )
        cropper.process_dir(jpeg_dir, out_dir, desc=None)
        return out_dir, cropper

    @needs_encoder
    def test_packed_equals_raw(self, tmp_path, jpeg_dir, monkeypatch):
        import face_crop_plus_tpu.utils.io as fio

        monkeypatch.setenv("FCPT_PACK_FETCH", "0")
        raw_dir, _ = self._run(tmp_path, jpeg_dir, "raw")

        # Count native-encoder writes: with random detector weights the
        # crops can be trivial (black), making a pixel comparison vacuous —
        # engagement of the packed path is the real assertion here (pixel
        # equivalence of the two writers is covered by the natural-image
        # encode tests above).
        writes = []
        orig = fio.imwrite_yuv420
        monkeypatch.setattr(
            fio,
            "imwrite_yuv420",
            lambda path, packed, size: writes.append(path) or orig(
                path, packed, size
            ),
        )
        monkeypatch.setenv("FCPT_PACK_FETCH", "1")
        packed_dir, cropper = self._run(tmp_path, jpeg_dir, "packed")
        assert cropper._packed_fetch_eligible(
            [f"pic_{i}.jpg" for i in range(4)]
        )
        assert len(writes) == 4  # every crop went through the packed writer

        raw_files = sorted(os.listdir(raw_dir))
        assert sorted(os.listdir(packed_dir)) == raw_files
        assert raw_files == [f"pic_{i}.jpg" for i in range(4)]
        for f in raw_files:
            a = cv2.imread(os.path.join(raw_dir, f)).astype(int)
            b = cv2.imread(os.path.join(packed_dir, f)).astype(int)
            assert a.shape == (64, 64, 3)
            assert b.shape == (64, 64, 3)
            # Same crops through two JPEG writers (device-packed planes vs
            # cv2's internal conversion): bounded rounding differences.
            assert np.abs(a - b).mean() < 1.5

    def test_pipeline_pack_bitwise(self, tmp_path, jpeg_dir, rng):
        """process(pack_crops=True) rows == numpy-packed raw crops."""
        from face_crop_plus_tpu import Cropper

        with pytest.warns(UserWarning, match="random"):
            cropper = Cropper(
                output_size=64,
                resize_size=128,
                det_threshold=-1.0,
                enh_threshold=None,
                device="cpu",
                batch_size=4,
            )
        cropper.det_model.vis_threshold = -1.0
        batch = np.stack(
            [_natural_image(rng, 120, 160) for _ in range(4)]
        )
        raw, lm_r, idx_r = cropper._fused.process(batch, (128, 128))
        packed, lm_p, idx_p = cropper._fused.process(
            batch, (128, 128), pack_crops=True
        )
        assert np.array_equal(lm_r, lm_p) and np.array_equal(idx_r, idx_p)
        assert packed.shape == (len(raw), packed_length((64, 64)))
        assert np.array_equal(packed, rgb_to_yuv420_np(raw))

    @needs_encoder
    def test_packed_with_parser_handoff(self, tmp_path, jpeg_dir,
                                        monkeypatch):
        """Parser-active batches pack the save copy when the parser reads
        the device crop array (single fused group ⇒ device handoff)."""
        import face_crop_plus_tpu.utils.io as fio

        def run(name, fetch):
            monkeypatch.setenv("FCPT_PACK_FETCH", "1" if fetch else "0")
            return self._run(
                tmp_path, jpeg_dir, name,
                mask_groups={"eyes": [4, 5]},
                attr_groups={"g": [6]},
            )

        raw_dir, _ = run("p_raw", False)

        writes = []
        orig = fio.imwrite_yuv420
        monkeypatch.setattr(
            fio,
            "imwrite_yuv420",
            lambda path, packed, size: writes.append(path) or orig(
                path, packed, size
            ),
        )
        packed_dir, cropper = run("p_packed", True)
        assert cropper._packed_fetch_eligible(
            ["pic_0.jpg"], parser_handoff=True
        )
        assert not cropper._packed_fetch_eligible(["pic_0.jpg"])
        assert writes  # crop saves went through the packed writer

        def tree(root):
            out = {}
            for dirpath, _dirs, files in os.walk(root):
                rel = os.path.relpath(dirpath, root)
                for f in files:
                    out[os.path.join(rel, f)] = os.path.join(dirpath, f)
            return out

        raw_t, packed_t = tree(raw_dir), tree(packed_dir)
        # Identical grouping tree (parser consumed identical device RGB
        # crops) and identical mask rasters; crop pixels within JPEG
        # writer rounding.
        assert sorted(raw_t) == sorted(packed_t) and raw_t
        for rel in raw_t:
            a = cv2.imread(raw_t[rel]).astype(int)
            b = cv2.imread(packed_t[rel]).astype(int)
            assert np.abs(a - b).mean() < 1.5

    def test_gate_rejects_non_jpeg_targets(self, tmp_path, jpeg_dir,
                                           monkeypatch):
        monkeypatch.setenv("FCPT_PACK_FETCH", "1")
        out_dir, cropper = self._run(
            tmp_path, jpeg_dir, "png_out", output_format="png"
        )
        assert not cropper._packed_fetch_eligible(["pic_0.jpg"])
        # PNG outputs exist and decode (raw path was used).
        outs = sorted(os.listdir(out_dir))
        assert outs == [f"pic_{i}.png" for i in range(4)]
        for f in outs:
            assert cv2.imread(os.path.join(out_dir, f)).shape == (64, 64, 3)

    def test_gate_defaults_off_on_cpu(self, tmp_path, jpeg_dir, monkeypatch):
        monkeypatch.delenv("FCPT_PACK_FETCH", raising=False)
        _out, cropper = self._run(tmp_path, jpeg_dir, "auto")
        # CPU backend: no device link to shorten — gate must say no.
        assert not cropper._packed_fetch_eligible(["pic_0.jpg"])
