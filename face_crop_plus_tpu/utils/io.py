"""Host-side image I/O: decode, encode, directory reading.

Image codecs are inherently host work (the only data path that feeds the
device), so this module intentionally stays on the CPU.  It prefers OpenCV's
C++ codecs when available and falls back to Pillow.  Behavioral parity with
reference ``src/face_crop_plus/utils.py:228-271`` (read) and
``src/face_crop_plus/cropper.py:554-609`` (write): unreadable files warn and
are skipped while index alignment is preserved; color images are saved via
BGR (OpenCV convention); masks are saved as single-channel images.
"""

from __future__ import annotations

import os
import warnings

import numpy as np

try:  # pragma: no cover - environment dependent
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False

try:  # pragma: no cover - environment dependent
    from PIL import Image

    _HAS_PIL = True
except Exception:  # pragma: no cover
    Image = None
    _HAS_PIL = False


def imread_rgb(path: str) -> np.ndarray | None:
    """Decodes one image file to an RGB uint8 (H, W, 3) array, or None.

    EXIF orientation is applied (``cv2.imread`` semantics — the reference's
    decode path); the PIL fallback transposes explicitly to match.
    """
    if _HAS_CV2:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            return None
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if _HAS_PIL:
        try:
            from PIL import ImageOps

            with Image.open(path) as im:
                return np.asarray(ImageOps.exif_transpose(im).convert("RGB"))
        except Exception:
            return None
    raise RuntimeError("No image decoding backend available (cv2 or PIL).")


def _tiff_orientation(d: bytes) -> int:
    """Orientation from a TIFF block (EXIF APP1 payload past 'Exif\\0\\0')."""
    import struct

    bo = d[:2]
    if bo == b"II":
        u16, u32 = "<H", "<I"
    elif bo == b"MM":
        u16, u32 = ">H", ">I"
    else:
        return 1
    (ifd_off,) = struct.unpack(u32, d[4:8])
    (count,) = struct.unpack(u16, d[ifd_off : ifd_off + 2])
    for e in range(count):
        ent = ifd_off + 2 + 12 * e
        (tag,) = struct.unpack(u16, d[ent : ent + 2])
        if tag != 0x0112:
            continue
        # Respect the entry's declared type: orientation is normally SHORT
        # (3) but writers emitting LONG (4) exist; anything else is treated
        # as unparseable rather than misread.
        (typ,) = struct.unpack(u16, d[ent + 2 : ent + 4])
        (cnt,) = struct.unpack(u32, d[ent + 4 : ent + 8])
        if cnt != 1:
            return 1
        if typ == 3:
            (val,) = struct.unpack(u16, d[ent + 8 : ent + 10])
        elif typ == 4:
            (val,) = struct.unpack(u32, d[ent + 8 : ent + 12])
        else:
            return 1
        return val if 1 <= val <= 8 else 1
    return 1


def jpeg_exif_orientation(path: str) -> int:
    """Reads the EXIF orientation tag (1-8) from a JPEG header, 1 on any
    parse failure.  Pure-Python scan of the APP1/TIFF structure — the
    native libjpeg decoder ignores EXIF, so its output must be transposed
    to keep pixel parity with ``cv2.imread`` (which auto-orients).

    Segment headers are streamed with seeks (no fixed read budget), so an
    APP1 sitting after large APPn segments — multi-segment ICC profiles,
    XMP — is still found; non-Exif APP1 segments (XMP) are skipped."""
    import struct

    try:
        with open(path, "rb") as f:
            if f.read(2) != b"\xff\xd8":
                return 1
            while True:
                b = f.read(1)
                if not b:
                    return 1
                if b[0] != 0xFF:
                    return 1
                m = f.read(1)
                while m == b"\xff":  # fill bytes before a marker
                    m = f.read(1)
                if not m:
                    return 1
                marker = m[0]
                if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                    continue  # standalone markers carry no length
                if marker == 0xDA:  # start of scan: no Exif APP1 seen
                    return 1
                ln = f.read(2)
                if len(ln) < 2:
                    return 1
                (seg_len,) = struct.unpack(">H", ln)
                if seg_len < 2:
                    return 1
                if marker == 0xE1:
                    payload = f.read(seg_len - 2)
                    if payload[:6] == b"Exif\x00\x00":
                        return _tiff_orientation(payload[6:])
                    continue  # other APP1 (e.g. XMP): keep scanning
                f.seek(seg_len - 2, 1)
    except Exception:
        return 1


def apply_exif_orientation(img: np.ndarray, orientation: int) -> np.ndarray:
    """Transposes a decoded raster upright per its EXIF orientation (the
    transforms PIL's ``exif_transpose`` / cv2's auto-orient apply)."""
    if orientation == 2:
        return np.ascontiguousarray(img[:, ::-1])
    if orientation == 3:
        return np.ascontiguousarray(img[::-1, ::-1])
    if orientation == 4:
        return np.ascontiguousarray(img[::-1, :])
    if orientation == 5:
        return np.ascontiguousarray(img.transpose(1, 0, 2))
    if orientation == 6:
        return np.ascontiguousarray(img.transpose(1, 0, 2)[:, ::-1])
    if orientation == 7:
        return np.ascontiguousarray(img.transpose(1, 0, 2)[::-1, ::-1])
    if orientation == 8:
        return np.ascontiguousarray(img.transpose(1, 0, 2)[::-1, :])
    return img


def imwrite(path: str, image: np.ndarray) -> bool:
    """Encodes an RGB (H, W, 3) or grayscale (H, W) uint8 array to a file.

    The encode goes to a temp file in the destination directory followed by
    an atomic rename, so a crash mid-write never leaves a truncated image —
    which matters for ``process_dir(skip_existing=True)``: a file's
    existence is its completeness marker on resume.
    """
    image = np.ascontiguousarray(image)
    base, ext = os.path.splitext(path)
    tmp = f"{base}.tmp-{os.getpid()}{ext}"
    try:
        if _HAS_CV2:
            if image.ndim == 3:
                image = cv2.cvtColor(image, cv2.COLOR_RGB2BGR)
            if not cv2.imwrite(tmp, image):
                return False
        elif _HAS_PIL:
            try:
                Image.fromarray(image).save(tmp)
            except Exception:
                # cv2.imwrite signals failure via its return value; mirror
                # that so callers keep their warn-and-skip semantics.
                return False
        else:
            raise RuntimeError("No image encoding backend available (cv2 or PIL).")
        os.replace(tmp, path)
        return True
    finally:
        if os.path.exists(tmp):
            try:
                os.unlink(tmp)
            except OSError:  # pragma: no cover
                pass


def imwrite_yuv420(
    path: str, packed: np.ndarray, output_size: tuple[int, int]
) -> bool:
    """Writes one device-packed YCbCr 4:2:0 crop row as a JPEG file.

    Packed rows come from :func:`face_crop_plus_tpu.ops.yuv.rgb_to_yuv420`
    — the JPEG encoder's lossy front half executed on device so crops
    cross the device→host link at half the bytes.  Same atomic
    temp-file + rename discipline as :func:`imwrite` (resume-marker
    safety), same cv2 JPEG defaults (quality 95, 4:2:0).  Returns False
    when the native encoder is unavailable or the encode fails; callers
    fall back to raw fetches, so a False here is a config error upstream.
    """
    from .native_io import encode_jpeg_yuv420

    base, ext = os.path.splitext(path)
    tmp = f"{base}.tmp-{os.getpid()}{ext}"
    try:
        if not encode_jpeg_yuv420(tmp, packed, output_size):
            return False
        os.replace(tmp, path)
        return True
    finally:
        if os.path.exists(tmp):
            try:
                os.unlink(tmp)
            except OSError:  # pragma: no cover
                pass


class PackedYUVImage:
    """A JPEG source decoded to its stored YCbCr 4:2:0 planes (host side).

    Produced by ``read_images(want_packed=True)`` for plain 4:2:0 files:
    entropy decode + IDCT only, 1.5 bytes/pixel — the chroma upsample and
    color conversion happen on device inside the fused detect program
    (``ops.yuv.yuv420_to_rgb``), halving host→device upload bytes.
    Carries just enough array surface (``shape``) for the Cropper's
    shape bookkeeping; any host path that needs pixels calls
    :meth:`to_rgb` (bit-identical to the device reconstruction).
    """

    __slots__ = ("packed", "h", "w")

    def __init__(self, packed: np.ndarray, h: int, w: int):
        self.packed = packed
        self.h = h
        self.w = w

    @property
    def shape(self) -> tuple[int, int, int]:
        return (self.h, self.w, 3)

    @property
    def group_key(self):
        """Fused-group key: packed sources never mix with RGB arrays."""
        return ("yuv420", self.h, self.w)

    def to_rgb(self) -> np.ndarray:
        from ..ops.yuv import yuv420_to_rgb_np

        return yuv420_to_rgb_np(self.packed, self.h, self.w)


def unpack_images(images: list) -> list:
    """Replaces any :class:`PackedYUVImage` entries with RGB arrays."""
    return [
        im.to_rgb() if isinstance(im, PackedYUVImage) else im for im in images
    ]


def read_images(
    file_names: list[str],
    input_dir: str,
    target_max: int | None = None,
    n_threads: int = 8,
    want_packed: bool = False,
) -> tuple[list[np.ndarray], np.ndarray]:
    """Reads a batch of images from a directory.

    Unreadable images produce a warning and are dropped; the returned file
    name array only contains names of images that decoded successfully
    (matches reference utils.py:228-271).

    JPEG files are decoded by the native multithreaded decoder
    (:mod:`face_crop_plus_tpu.utils.native_io`) when available; with
    ``target_max`` set, oversized sources are decoded directly at 1/2–1/8
    scale in the DCT domain — never below the pipeline's working resolution
    — skipping most of the decode work and host→device bytes.  Non-JPEG
    files and native-decode failures fall back to cv2/PIL, also decoded in
    parallel (cv2/PIL release the GIL in their codecs) so PNG-heavy
    directories keep full decode throughput.

    Native JPEG decode defaults to pixel parity with ``cv2.imread``
    (accurate IDCT + fancy chroma upsampling); set ``FCPT_FAST_DECODE=1``
    to trade a few intensity levels on chroma-subsampled files for decode
    throughput.

    With ``want_packed``, plain 4:2:0 JPEGs (EXIF-upright) decode to
    :class:`PackedYUVImage` instead of RGB arrays — entropy decode + IDCT
    only; the color reconstruction runs on device.  Everything else
    (other samplings, rotated files, non-JPEG) still decodes to RGB.

    Returns:
        Tuple of a list of RGB uint8 (H, W, 3) arrays (and/or
        :class:`PackedYUVImage` under ``want_packed``) and the
        corresponding (N,) file name array.
    """
    from . import native_io

    fast = os.environ.get("FCPT_FAST_DECODE", "0") == "1"
    paths = [os.path.join(input_dir, f) for f in file_names]
    results: list[np.ndarray | None] = [None] * len(paths)

    native_ok: set[int] = set()
    if native_io.available():
        jpg_ids = [
            i
            for i, p in enumerate(paths)
            if p.lower().endswith((".jpg", ".jpeg"))
        ]
        if jpg_ids:
            if target_max:
                # Group by DCT scale factor chosen from header dims (header
                # reads go through the thread pool too — one serial open per
                # file would gate the parallel decode on slow storage).
                if len(jpg_ids) > 1 and n_threads > 1:
                    from multiprocessing.pool import ThreadPool

                    with ThreadPool(min(n_threads, len(jpg_ids))) as pool:
                        all_dims = pool.map(
                            native_io.jpeg_dims, [paths[i] for i in jpg_ids]
                        )
                else:
                    all_dims = [native_io.jpeg_dims(paths[i]) for i in jpg_ids]
                by_denom: dict[int, list[int]] = {}
                for i, dims in zip(jpg_ids, all_dims):
                    denom = (
                        native_io.pick_scale_denom(dims, target_max) if dims else 1
                    )
                    by_denom.setdefault(denom, []).append(i)
            else:
                by_denom = {1: jpg_ids}
            for denom, ids in by_denom.items():
                rgb_ids = ids
                if want_packed:
                    # EXIF-rotated files keep the RGB path (orientation
                    # transforms on subsampled planes are lossy).  The
                    # orientation probe is a header scan — run it BEFORE
                    # the full decode (and in parallel) so rotated files
                    # are not entropy-decoded twice.
                    if len(ids) > 1 and n_threads > 1:
                        from multiprocessing.pool import ThreadPool

                        with ThreadPool(min(n_threads, len(ids))) as pool:
                            orients = pool.map(
                                jpeg_exif_orientation,
                                [paths[i] for i in ids],
                            )
                    else:
                        orients = [
                            jpeg_exif_orientation(paths[i]) for i in ids
                        ]
                    upright = [i for i, o in zip(ids, orients) if o == 1]
                    rgb_ids = [i for i, o in zip(ids, orients) if o != 1]
                    if upright:
                        packed_res = native_io.decode_yuv420_batch(
                            [paths[i] for i in upright],
                            scale_denom=denom,
                            n_threads=n_threads,
                        )
                        for i, res in zip(upright, packed_res):
                            if res is not None:
                                results[i] = PackedYUVImage(*res)
                                native_ok.add(i)
                            else:
                                rgb_ids.append(i)
                    if not rgb_ids:
                        continue
                decoded = native_io.decode_batch(
                    [paths[i] for i in rgb_ids],
                    scale_denom=denom,
                    n_threads=n_threads,
                    fast=fast,
                )
                for i, img in zip(rgb_ids, decoded):
                    if img is not None:
                        # libjpeg ignores EXIF; transpose upright to keep
                        # pixel parity with cv2.imread's auto-orientation.
                        results[i] = apply_exif_orientation(
                            img, jpeg_exif_orientation(paths[i])
                        )
                        native_ok.add(i)

    fallback_ids = [i for i in range(len(paths)) if i not in native_ok]
    if len(fallback_ids) > 1 and n_threads > 1:
        from multiprocessing.pool import ThreadPool

        with ThreadPool(min(n_threads, len(fallback_ids))) as pool:
            for i, img in zip(
                fallback_ids, pool.map(imread_rgb, [paths[i] for i in fallback_ids])
            ):
                results[i] = img
    else:
        for i in fallback_ids:
            results[i] = imread_rgb(paths[i])

    images, kept = [], []
    for i, path in enumerate(paths):
        image = results[i]
        if image is None:
            warnings.warn(f"Could not read the image {path}")
            continue
        images.append(image)
        kept.append(i)
    return images, np.array(file_names)[kept]
