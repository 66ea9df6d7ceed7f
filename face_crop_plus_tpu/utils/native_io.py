"""ctypes bindings for the native batch image decoder (``native/fcpt_io``).

The native library provides multithreaded libjpeg decoding with DCT-domain
downscaling (1/2, 1/4, 1/8) — the host-side equivalent of the reference's
reliance on OpenCV's C++ internals, specialized for this pipeline's access
pattern.  Builds on demand with ``make`` (g++ + libjpeg) and degrades
gracefully: when the toolchain or library is unavailable, callers fall back
to cv2/PIL decoding transparently.

Run ``python -m face_crop_plus_tpu.utils.native_io`` to (re)build and
self-test the library.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libfcpt_io.so")

_lib = None
_lib_lock = threading.Lock()
_build_attempted = False

_TAG_PATH = _SO_PATH + ".hosttag"


def _host_tag() -> str:
    """Fingerprint of this host's ISA surface (machine + cpu flags hash).

    The library is compiled ``-march=native``; make's mtime comparison
    cannot see that a newer-than-source binary was built on a *different*
    host (shared checkout, rsync -a), which would SIGILL on first call.
    A sidecar tag written at build time makes the mismatch detectable.
    """
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line
                    break
    except OSError:  # pragma: no cover - non-procfs platforms
        pass
    digest = hashlib.sha256(flags.encode()).hexdigest()[:16]
    return f"{platform.machine()}:{digest}"


def _read_tag() -> str | None:
    try:
        with open(_TAG_PATH) as f:
            return f.read().strip()
    except OSError:
        return None


def _try_build() -> bool:
    global _build_attempted
    if _build_attempted:
        return os.path.isfile(_SO_PATH)
    _build_attempted = True
    if not os.path.isfile(os.path.join(_NATIVE_DIR, "fcpt_io.cpp")):
        return False
    cmd = ["make", "-C", _NATIVE_DIR, "libfcpt_io.so"]
    if os.path.isfile(_SO_PATH) and _read_tag() != _host_tag():
        # Binary of unknown/foreign provenance: force the rebuild (mtimes
        # alone would accept a newer-than-source foreign-host .so).
        cmd.insert(1, "-B")
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return False
    if not os.path.isfile(_SO_PATH):
        return False
    try:
        with open(_TAG_PATH, "w") as f:
            f.write(_host_tag())
    except OSError:  # pragma: no cover - read-only checkout
        pass
    return True


def load_library():
    """Loads (building if needed) the native library; None when unavailable."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        # Always run make once per process: it is a no-op when the .so is
        # fresh, and rebuilds a stale/foreign-host binary (the library is
        # compiled -march=native and never shipped).  A present .so is
        # still used if the toolchain is unavailable — unless its host tag
        # affirmatively mismatches (a foreign -march=native binary would
        # SIGILL, worse than the cv2/PIL fallback).
        if not _try_build():
            if not os.path.isfile(_SO_PATH):
                return None
            tag = _read_tag()
            if tag is not None and tag != _host_tag():
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.fcpt_decode_jpeg.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.fcpt_decode_jpeg.restype = ctypes.c_int
        lib.fcpt_jpeg_dims.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.fcpt_jpeg_dims.restype = ctypes.c_int
        lib.fcpt_free.argtypes = [ctypes.POINTER(ctypes.c_ubyte)]
        lib.fcpt_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.fcpt_decode_batch.restype = ctypes.c_int
        try:  # stale pre-warp .so without a toolchain to rebuild it
            lib.fcpt_warp_affine_u8.argtypes = [
                ctypes.POINTER(ctypes.c_ubyte),  # images
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,  # n,h,w,c
                ctypes.POINTER(ctypes.c_float),  # inv_mats
                ctypes.POINTER(ctypes.c_int),  # img_idx
                ctypes.POINTER(ctypes.c_int),  # windows (nullable)
                ctypes.c_int, ctypes.c_int, ctypes.c_int,  # f, oh, ow
                ctypes.c_int, ctypes.c_int, ctypes.c_int,  # border_mode, exact, n_threads
                ctypes.POINTER(ctypes.c_ubyte),  # out
            ]
            lib.fcpt_warp_affine_u8.restype = ctypes.c_int
            lib._has_native_warp = True
        except AttributeError:  # pragma: no cover - stale binary only
            lib._has_native_warp = False
        try:  # stale pre-r5 .so without a toolchain to rebuild it
            lib.fcpt_warp_affine_u8_bv.argtypes = [
                ctypes.POINTER(ctypes.c_ubyte),  # images
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,  # n,h,w,c
                ctypes.POINTER(ctypes.c_float),  # inv_mats
                ctypes.POINTER(ctypes.c_int),  # img_idx
                ctypes.POINTER(ctypes.c_int),  # windows (nullable)
                ctypes.c_int, ctypes.c_int, ctypes.c_int,  # f, oh, ow
                ctypes.c_int, ctypes.c_int, ctypes.c_int,  # border_mode, exact, n_threads
                ctypes.POINTER(ctypes.c_ubyte),  # border_value (nullable)
                ctypes.POINTER(ctypes.c_ubyte),  # out
            ]
            lib.fcpt_warp_affine_u8_bv.restype = ctypes.c_int
            lib._has_native_warp_bv = True
            lib.fcpt_warp_yuv420.argtypes = [
                ctypes.POINTER(ctypes.c_ubyte),  # packed source rows
                ctypes.c_int, ctypes.c_int, ctypes.c_int,  # n, h, w
                ctypes.POINTER(ctypes.c_float),  # inv_y
                ctypes.POINTER(ctypes.c_float),  # inv_c
                ctypes.POINTER(ctypes.c_int),  # img_idx
                ctypes.c_int, ctypes.c_int, ctypes.c_int,  # f, oh, ow
                ctypes.c_int, ctypes.c_int, ctypes.c_int,  # mode, exact, threads
                ctypes.POINTER(ctypes.c_ubyte),  # out packed rows
            ]
            lib.fcpt_warp_yuv420.restype = ctypes.c_int
        except AttributeError:  # pragma: no cover - stale binary only
            lib._has_native_warp_bv = False
        try:  # stale pre-r4 .so without a toolchain to rebuild it
            lib.fcpt_yuv420_to_rgb.argtypes = [
                ctypes.POINTER(ctypes.c_ubyte),  # packed rows
                ctypes.c_int, ctypes.c_int, ctypes.c_int,  # n, h, w
                ctypes.c_int,  # n_threads
                ctypes.POINTER(ctypes.c_ubyte),  # out rgb
            ]
            lib.fcpt_yuv420_to_rgb.restype = ctypes.c_int
            lib._has_yuv_to_rgb = True
        except AttributeError:  # pragma: no cover - stale binary only
            lib._has_yuv_to_rgb = False
        try:  # stale pre-encoder .so without a toolchain to rebuild it
            lib.fcpt_jpeg_encode_yuv420.argtypes = [
                ctypes.POINTER(ctypes.c_ubyte),  # y
                ctypes.POINTER(ctypes.c_ubyte),  # cb
                ctypes.POINTER(ctypes.c_ubyte),  # cr
                ctypes.c_int, ctypes.c_int, ctypes.c_int,  # h, w, quality
                ctypes.c_char_p,  # path
            ]
            lib.fcpt_jpeg_encode_yuv420.restype = ctypes.c_int
            lib.fcpt_encode_yuv420_batch.argtypes = [
                ctypes.POINTER(ctypes.c_ubyte),  # packed
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_char_p),  # paths
                ctypes.c_int,  # n_threads
                ctypes.POINTER(ctypes.c_int),  # oks
            ]
            lib.fcpt_encode_yuv420_batch.restype = ctypes.c_int
            lib.fcpt_decode_jpeg_yuv420.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
            lib.fcpt_decode_jpeg_yuv420.restype = ctypes.c_int
            lib.fcpt_decode_yuv420_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
                ctypes.c_int,
            ]
            lib.fcpt_decode_yuv420_batch.restype = ctypes.c_int
            lib._has_yuv_encoder = True
        except AttributeError:  # pragma: no cover - stale binary only
            lib._has_yuv_encoder = False
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


def decode_jpeg(path: str, scale_denom: int = 1, fast: bool = False) -> np.ndarray | None:
    """Decodes one JPEG to an RGB uint8 array (None on failure).

    ``fast=False`` (default) decodes with accurate IDCT + fancy chroma
    upsampling — pixel-identical to ``cv2.imread``; ``fast=True`` trades a
    few intensity levels on chroma-subsampled files for throughput.
    """
    lib = load_library()
    if lib is None:
        return None
    buf = ctypes.POINTER(ctypes.c_ubyte)()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.fcpt_decode_jpeg(
        path.encode(), ctypes.byref(buf), ctypes.byref(h), ctypes.byref(w),
        scale_denom, int(fast),
    )
    if rc != 0:
        return None
    try:
        arr = np.ctypeslib.as_array(buf, shape=(h.value, w.value, 3)).copy()
    finally:
        lib.fcpt_free(buf)
    return arr


def jpeg_dims(path: str) -> tuple[int, int] | None:
    """Full-resolution (height, width) from the JPEG header only."""
    lib = load_library()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.fcpt_jpeg_dims(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    return h.value, w.value


def decode_batch(
    paths: list[str], scale_denom: int = 1, n_threads: int = 8, fast: bool = False
) -> list[np.ndarray | None]:
    """Decodes many JPEGs in parallel native threads (None per failure)."""
    lib = load_library()
    if lib is None:
        return [None] * len(paths)
    n = len(paths)
    if n == 0:
        return []
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    outs = (ctypes.POINTER(ctypes.c_ubyte) * n)()
    hs = (ctypes.c_int * n)()
    ws = (ctypes.c_int * n)()
    oks = (ctypes.c_int * n)()
    lib.fcpt_decode_batch(
        c_paths, n, outs, hs, ws, oks, scale_denom, n_threads, int(fast)
    )
    results: list[np.ndarray | None] = []
    for i in range(n):
        if oks[i] == 0 and outs[i]:
            arr = np.ctypeslib.as_array(outs[i], shape=(hs[i], ws[i], 3)).copy()
            lib.fcpt_free(outs[i])
            results.append(arr)
        else:
            results.append(None)
    return results


def pick_scale_denom(src_hw: tuple[int, int], target_max: int) -> int:
    """Largest DCT downscale that keeps max(dim) >= the pipeline target."""
    m = max(src_hw)
    for d in (8, 4, 2):
        if m // d >= target_max:
            return d
    return 1


if __name__ == "__main__":  # build + self-test
    ok = available()
    print(f"native io available: {ok} ({_SO_PATH})")


#: Border-mode names → native enum (must match fcpt_io.cpp map_index).
_BORDER_ENUM = {"constant": 0, "replicate": 1, "reflect": 2, "wrap": 3,
                "reflect_101": 4}


def _invert_affine_np(m: np.ndarray) -> np.ndarray:
    """Numpy mirror of ops.transform.invert_affine (sign-preserving eps)."""
    m = np.asarray(m, np.float32)
    a, b, tx = m[:, 0, 0], m[:, 0, 1], m[:, 0, 2]
    c, d, ty = m[:, 1, 0], m[:, 1, 1], m[:, 1, 2]
    det = a * d - b * c
    det = np.where(np.abs(det) < 1e-12, np.where(det < 0, -1e-12, 1e-12), det)
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    return np.stack(
        [np.stack([ia, ib, itx], axis=-1), np.stack([ic, id_, ity], axis=-1)],
        axis=1,
    ).astype(np.float32)


def decode_jpeg_yuv420(
    path: str, scale_denom: int = 1
) -> tuple[np.ndarray, int, int] | None:
    """Decodes a 4:2:0 JPEG to its stored planar YCbCr samples.

    Entropy decode + IDCT only — no chroma upsample, no color conversion
    (the pipeline performs the inverse on device after uploading
    1.5 bytes/pixel; see ``ops.yuv.yuv420_to_rgb``).  Returns
    ``(packed_1d, h, w)`` or None when the file is not plain 4:2:0 YCbCr
    (grayscale/4:4:4/odd dims/progressive errors) — callers fall back to
    the RGB decoder.
    """
    lib = load_library()
    if lib is None or not getattr(lib, "_has_yuv_encoder", False):
        return None
    buf = ctypes.POINTER(ctypes.c_ubyte)()
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.fcpt_decode_jpeg_yuv420(
        path.encode(), ctypes.byref(buf), ctypes.byref(h), ctypes.byref(w),
        scale_denom,
    )
    if rc != 0:
        return None
    try:
        size = h.value * w.value + 2 * (h.value // 2) * (w.value // 2)
        arr = np.ctypeslib.as_array(buf, shape=(size,)).copy()
    finally:
        lib.fcpt_free(buf)
    return arr, h.value, w.value


def decode_yuv420_batch(
    paths: list[str], scale_denom: int = 1, n_threads: int = 8
) -> list[tuple[np.ndarray, int, int] | None]:
    """Batch version of :func:`decode_jpeg_yuv420` (parallel native threads).

    None per file that is unreadable or not plain 4:2:0 (callers retry
    those with the RGB decoder).
    """
    lib = load_library()
    n = len(paths)
    if lib is None or not getattr(lib, "_has_yuv_encoder", False):
        return [None] * n
    if n == 0:
        return []
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    outs = (ctypes.POINTER(ctypes.c_ubyte) * n)()
    hs = (ctypes.c_int * n)()
    ws = (ctypes.c_int * n)()
    oks = (ctypes.c_int * n)()
    lib.fcpt_decode_yuv420_batch(
        c_paths, n, outs, hs, ws, oks, scale_denom, n_threads
    )
    results: list[tuple[np.ndarray, int, int] | None] = []
    for i in range(n):
        if oks[i] == 0 and outs[i]:
            size = hs[i] * ws[i] + 2 * (hs[i] // 2) * (ws[i] // 2)
            arr = np.ctypeslib.as_array(outs[i], shape=(size,)).copy()
            lib.fcpt_free(outs[i])
            results.append((arr, hs[i], ws[i]))
        else:
            if outs[i]:  # pragma: no cover - defensive
                lib.fcpt_free(outs[i])
            results.append(None)
    return results


def yuv_encoder_available() -> bool:
    """True when the native raw-data JPEG encoder can be called."""
    lib = load_library()
    return lib is not None and getattr(lib, "_has_yuv_encoder", False)


def encode_jpeg_yuv420(
    path: str,
    packed: np.ndarray,
    output_size: tuple[int, int],
    quality: int = 95,
) -> bool:
    """Encodes one packed planar YCbCr 4:2:0 row to a baseline JPEG file.

    ``packed`` is one crop's ``ops.yuv.rgb_to_yuv420`` output row
    (``h*w + 2*(h//2)*(w//2)`` bytes, planes Y|Cb|Cr); ``output_size`` is
    (width, height), both even.  ``quality`` defaults to cv2.imwrite's
    JPEG default so files are byte-comparable with the raw-crop path.
    The GIL is released during the encode.  Returns False on failure (the
    caller falls back or surfaces the error; nothing is retried here).
    """
    lib = load_library()
    if lib is None or not getattr(lib, "_has_yuv_encoder", False):
        return False
    w, h = output_size
    if h < 2 or w < 2 or h % 2 or w % 2:
        return False
    packed = np.ascontiguousarray(packed, np.uint8).reshape(-1)
    ylen, clen = h * w, (h // 2) * (w // 2)
    if packed.size != ylen + 2 * clen:
        return False
    base = packed.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
    cb = ctypes.cast(
        ctypes.addressof(base.contents) + ylen, ctypes.POINTER(ctypes.c_ubyte)
    )
    cr = ctypes.cast(
        ctypes.addressof(base.contents) + ylen + clen,
        ctypes.POINTER(ctypes.c_ubyte),
    )
    rc = lib.fcpt_jpeg_encode_yuv420(base, cb, cr, h, w, quality, path.encode())
    return rc == 0


def encode_jpeg_yuv420_batch(
    paths: list[str],
    packed: np.ndarray,
    output_size: tuple[int, int],
    quality: int = 95,
    n_threads: int = 0,
) -> list[bool]:
    """Encodes many packed 4:2:0 rows in parallel native threads."""
    lib = load_library()
    n = len(paths)
    if lib is None or not getattr(lib, "_has_yuv_encoder", False):
        return [False] * n
    if n == 0:
        return []
    w, h = output_size
    packed = np.ascontiguousarray(packed, np.uint8).reshape(n, -1)
    if h < 2 or w < 2 or h % 2 or w % 2 or packed.shape[1] != h * w + 2 * (
        h // 2
    ) * (w // 2):
        return [False] * n
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    oks = (ctypes.c_int * n)()
    if n_threads < 1:
        n_threads = min(4, os.cpu_count() or 1)
    rc = lib.fcpt_encode_yuv420_batch(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n, h, w, quality, c_paths, n_threads, oks,
    )
    if rc != 0:
        return [False] * n
    return [oks[i] == 0 for i in range(n)]


def yuv420_to_rgb_native(
    packed: np.ndarray, h: int, w: int, n_threads: int = 0
) -> np.ndarray | None:
    """Native counterpart of ``ops.yuv.yuv420_to_rgb_np`` (threaded C++).

    Bit-identical to the numpy/device reconstruction (same float32
    expression order, fp-contract off) at ~10x numpy's speed — the
    host-crop packed path reconstructs its warp sources with this.
    Returns None when the native library is unavailable.
    """
    lib = load_library()
    if lib is None or not getattr(lib, "_has_yuv_to_rgb", False):
        return None
    packed = np.ascontiguousarray(packed, np.uint8)
    squeeze = packed.ndim == 1
    if squeeze:
        packed = packed[None]
    n = packed.shape[0]
    if h < 2 or w < 2 or h % 2 or w % 2:
        return None
    if packed.shape[1] != h * w + 2 * (h // 2) * (w // 2):
        return None
    out = np.empty((n, h, w, 3), np.uint8)
    if n_threads < 1:
        n_threads = min(4, os.cpu_count() or 1)
    rc = lib.fcpt_yuv420_to_rgb(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n, h, w, int(n_threads),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    if rc != 0:
        return None
    return out[0] if squeeze else out


def native_warp_available(border_mode: str = "constant") -> bool:
    """True when :func:`warp_affine_batch_native` can serve this mode."""
    lib = load_library()
    return (
        lib is not None
        and bool(getattr(lib, "_has_native_warp", False))
        and border_mode in _BORDER_ENUM
    )


def warp_affine_batch_native(
    images: np.ndarray,
    matrices: np.ndarray,
    img_idx: np.ndarray,
    output_size: tuple[int, int],
    border_mode: str = "constant",
    windows: np.ndarray | None = None,
    n_threads: int = 0,
    exact: bool = True,
    border_value: tuple[int, ...] | None = None,
) -> np.ndarray | None:
    """Host-native counterpart of ``ops.warp.warp_affine_batch`` (uint8 out).

    Same contract: forward (F, 2, 3) transforms (inverted here), optional
    per-face un-padded windows, cv2 border semantics; returns uint8 crops
    (F, Ho, Wo, C), or None when the native library is unavailable.  The
    GIL is released for the call, so the Cropper's worker threads overlap.

    ``exact=True`` matches the device warp bit-for-bit up to float
    rounding order (round-half-even); ``exact=False`` samples with 10-bit
    fixed-point arithmetic (the cv2 INTER_LINEAR family, which uses 5
    bits) — within one intensity level of the exact path, faster.

    ``border_value`` sets the constant-border color per channel (default
    black/zero; the YUV-direct crop path passes ``(128, 128)`` for chroma
    planes).  Returns None when set but the loaded binary predates the
    ``_bv`` entry point.
    """
    lib = load_library()
    if (
        lib is None
        or not getattr(lib, "_has_native_warp", False)
        or border_mode not in _BORDER_ENUM
    ):
        return None
    if border_value is not None and not getattr(lib, "_has_native_warp_bv", False):
        return None
    images = np.ascontiguousarray(images, np.uint8)
    n, h, w, c = images.shape
    f = int(np.shape(matrices)[0])
    wo, ho = output_size
    out = np.empty((f, ho, wo, c), np.uint8)
    if f == 0:
        return out
    inv = np.ascontiguousarray(_invert_affine_np(matrices).reshape(f, 6))
    idx = np.ascontiguousarray(np.asarray(img_idx, np.int32))
    win_ptr = None
    if windows is not None:
        win = np.ascontiguousarray(np.asarray(windows, np.int32))
        win_ptr = win.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
    if n_threads < 1:
        n_threads = min(4, os.cpu_count() or 1)
    if border_value is not None:
        bv = np.ascontiguousarray(np.asarray(border_value, np.uint8))
        if bv.size != c:
            return None
        rc = lib.fcpt_warp_affine_u8_bv(
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            n, h, w, c,
            inv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            win_ptr, f, ho, wo, _BORDER_ENUM[border_mode], int(exact),
            n_threads,
            bv.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        return out if rc == 0 else None
    rc = lib.fcpt_warp_affine_u8(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n, h, w, c,
        inv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        win_ptr, f, ho, wo, _BORDER_ENUM[border_mode], int(exact), n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out if rc == 0 else None


def chroma_conjugate_affine(matrices: np.ndarray) -> np.ndarray:
    """Maps full-resolution affine transforms onto the 4:2:0 chroma grid.

    JPEG 4:2:0 chroma sample (i, j) sits at full-resolution pixel-center
    coordinate (2i + 0.5, 2j + 0.5) (JFIF centered siting — the same
    convention as the framework's [0.75, 0.25] upsample twins in
    ``ops.yuv``).  Conjugating a transform by that grid map keeps the
    linear part and shifts the translation:

        q' = A q + (A·[.5,.5] + t − [.5,.5]) / 2

    Applies identically to forward and inverse matrices (conjugation
    commutes with inversion).  Input/output: float32 (F, 2, 3).
    """
    m = np.asarray(matrices, np.float32)
    A = m[:, :, :2]
    t = m[:, :, 2]
    half = np.array([0.5, 0.5], np.float32)
    tc = (A @ half + t - half) / 2.0
    return np.concatenate([A, tc[:, :, None]], axis=2).astype(np.float32)


def warp_yuv420_available(border_mode: str = "constant") -> bool:
    """True when :func:`warp_yuv420_batch_native` can serve this mode."""
    lib = load_library()
    return (
        lib is not None
        and bool(getattr(lib, "_has_native_warp_bv", False))
        and border_mode in _BORDER_ENUM
    )


def warp_yuv420_batch_native(
    packed: np.ndarray,
    src_hw: tuple[int, int],
    matrices: np.ndarray,
    img_idx: np.ndarray,
    output_size: tuple[int, int],
    border_mode: str = "constant",
    n_threads: int = 0,
    exact: bool = False,
) -> np.ndarray | None:
    """Warps faces straight from packed YCbCr 4:2:0 source rows.

    The YUV-direct crop pipeline: JPEG sources decode to their stored
    planes (entropy + IDCT only), faces warp per plane — Y at full
    resolution, Cb/Cr on the half-resolution chroma grid via
    :func:`chroma_conjugate_affine` with a 128 (color-neutral) constant
    border — and the packed output rows feed the raw-data JPEG encoder.
    Full-size RGB is never materialized; the warp moves half the bytes
    of its RGB counterpart.  Chroma interpolates on the subsampled grid
    instead of upsample→warp→downsample, so crops sit within ~1 level of
    the RGB path on smooth content (the band the packed wire formats
    already document); luma matches the RGB path's Y within rounding.

    Args:
        packed: (N, L) uint8 packed source rows (planes Y|Cb|Cr).
        src_hw: Source (H, W), both even.
        matrices: Forward (F, 2, 3) full-resolution transforms
            (inverted and chroma-conjugated here).
        img_idx: (F,) int source-row index per face.
        output_size: (Wo, Ho), both even.
        border_mode: cv2-family border name.
        n_threads: Worker threads (0 = auto).
        exact: Exact float sampling instead of 10-bit fixed-point.

    Returns:
        (F, Lo) uint8 packed crop rows, or None when the native library
        (with the r5 entry points) is unavailable or shapes are invalid.
    """
    lib = load_library()
    if (
        lib is None
        or not getattr(lib, "_has_native_warp_bv", False)
        or border_mode not in _BORDER_ENUM
    ):
        return None
    h, w = int(src_hw[0]), int(src_hw[1])
    wo, ho = int(output_size[0]), int(output_size[1])
    if h % 2 or w % 2 or ho % 2 or wo % 2 or min(h, w, ho, wo) < 2:
        return None
    packed = np.ascontiguousarray(packed, np.uint8)
    if packed.ndim != 2 or packed.shape[1] != h * w + 2 * (h // 2) * (w // 2):
        return None
    n = packed.shape[0]
    f = int(np.shape(matrices)[0])
    out = np.empty((f, ho * wo + 2 * (ho // 2) * (wo // 2)), np.uint8)
    if f == 0:
        return out
    # Conjugate the forward transform first, then invert — the same float
    # op order as a per-plane composition through warp_affine_batch_native
    # (conjugation and inversion commute exactly, but not in float32).
    inv_y = np.ascontiguousarray(_invert_affine_np(matrices).reshape(f, 6))
    inv_c = np.ascontiguousarray(
        _invert_affine_np(chroma_conjugate_affine(matrices)).reshape(f, 6)
    )
    idx = np.ascontiguousarray(np.asarray(img_idx, np.int32))
    if n_threads < 1:
        n_threads = min(4, os.cpu_count() or 1)
    rc = lib.fcpt_warp_yuv420(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n, h, w,
        inv_y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        inv_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        f, ho, wo, _BORDER_ENUM[border_mode], int(exact), n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out if rc == 0 else None
