"""Pretrained-weight conversion, caching and loading.

The reference downloads torch ``.pth`` state dicts from its GitHub release
and loads them with ``torch.hub`` (``src/face_crop_plus/models/_layers.py:
12-35``).  Here the equivalent pipeline is: fetch/copy the same ``.pth``
files once, convert them to framework-native flat numpy archives (``.npz``)
with TPU layouts, cache, and load as JAX pytrees.

Conversion rules (pure layout transforms — our parameter names mirror the
reference's torch module paths exactly):

* 4-D conv kernels: OIHW → HWIO transpose.
* BatchNorm (weight/bias/running_mean/running_var, eps=1e-5): folded to
  inference ``scale`` = γ/√(σ²+ε) and ``bias`` = β − μ·scale.
* ``num_batches_tracked`` buffers: dropped.
* Everything else (conv biases): copied as-is.

Because this environment may have no network access, every model can also be
randomly initialized (``Params`` init mode) so the full pipeline stays
runnable and benchmarkable; a warning marks the fallback.
"""

from __future__ import annotations

import os
import warnings

import numpy as np

#: Upstream release that hosts the three pretrained checkpoints
#: (reference _layers.py:13).
UPSTREAM_URL_ROOT = (
    "https://github.com/mantasu/face-crop-plus/releases/download/v1.0.0/"
)

#: Reference checkpoint filenames per model (retinaface.py:52, rrdb.py:35,
#: bise.py:120).
PTH_FILENAMES = {
    "retinaface": "retinaface_detector.pth",
    "rrdb": "bsrgan_x4_enhancer.pth",
    "bisenet": "bise_parser.pth",
}

BN_EPS = 1e-5


def default_cache_dir() -> str:
    return os.environ.get(
        "FCPT_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "face_crop_plus_tpu"),
    )


def convert_state_dict(sd: dict) -> dict[str, np.ndarray]:
    """Converts a torch state dict to the framework's flat numpy format."""

    def to_np(t):
        # Works for torch tensors and numpy arrays alike.
        return np.asarray(getattr(t, "detach", lambda: t)().cpu().numpy()
                          if hasattr(t, "cpu") else t)

    arrays = {k: to_np(v) for k, v in sd.items() if not k.endswith("num_batches_tracked")}

    # Identify BatchNorm modules: prefixes owning running statistics.
    bn_prefixes = {
        k[: -len(".running_mean")] for k in arrays if k.endswith(".running_mean")
    }

    out: dict[str, np.ndarray] = {}
    for key, val in arrays.items():
        prefix, _, leaf = key.rpartition(".")
        if prefix in bn_prefixes:
            if leaf != "weight":
                continue  # emit once per module, from the gamma entry
            gamma = arrays[f"{prefix}.weight"].astype(np.float64)
            beta = arrays[f"{prefix}.bias"].astype(np.float64)
            mean = arrays[f"{prefix}.running_mean"].astype(np.float64)
            var = arrays[f"{prefix}.running_var"].astype(np.float64)
            scale = gamma / np.sqrt(var + BN_EPS)
            out[f"{prefix}.scale"] = scale.astype(np.float32)
            out[f"{prefix}.bias"] = (beta - mean * scale).astype(np.float32)
        elif leaf == "weight" and val.ndim == 4:
            out[key] = np.transpose(val, (2, 3, 1, 0)).astype(np.float32)  # OIHW→HWIO
        else:
            out[key] = val.astype(np.float32)
    return out


def convert_pth_file(pth_path: str) -> dict[str, np.ndarray]:
    """Loads a torch ``.pth`` checkpoint and converts it (host-side, once)."""
    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert_state_dict(sd)


def save_npz(params: dict[str, np.ndarray], path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_npz(path: str) -> dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


#: URL roots that already failed once this process — skipped on retry so a
#: network-less environment pays the connect timeout at most once.
_failed_url_roots: set = set()


def download_pth(
    model_name: str,
    dest_dir: str | None = None,
    url_root: str | None = None,
    timeout: float | None = None,
) -> str | None:
    """Fetches the reference's released ``.pth`` checkpoint into the cache.

    Equivalent of the reference's ``torch.hub.load_state_dict_from_url``
    auto-download (``_layers.py:27-35``): downloads
    ``<url_root>/<pth_filename>`` to ``dest_dir`` (default cache dir) via a
    temp file + atomic rename (concurrent processes see either nothing or a
    complete file).  Returns the local path, or None when the file cannot be
    fetched (no network, HTTP error) — callers then fall back gracefully.

    ``url_root`` defaults to :data:`UPSTREAM_URL_ROOT`; ``file://`` URLs are
    supported (used by tests, and handy for air-gapped weight mirrors).
    Set ``FCPT_NO_DOWNLOAD=1`` to disable all network access.
    """
    if os.environ.get("FCPT_NO_DOWNLOAD", "0") == "1":
        return None
    fname = PTH_FILENAMES.get(model_name)
    if fname is None:
        return None
    dest_dir = dest_dir or default_cache_dir()
    dest = os.path.join(dest_dir, fname)
    if os.path.isfile(dest):
        return dest

    root = url_root or os.environ.get("FCPT_WEIGHTS_URL", UPSTREAM_URL_ROOT)
    if not root.endswith("/"):
        root += "/"
    if root in _failed_url_roots:
        return None
    url = root + fname
    if timeout is None:
        timeout = float(os.environ.get("FCPT_DOWNLOAD_TIMEOUT", "15"))
    import tempfile
    import urllib.request

    try:
        os.makedirs(dest_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=dest_dir, suffix=".part")
        try:
            with os.fdopen(fd, "wb") as out, urllib.request.urlopen(
                url, timeout=timeout
            ) as resp:
                while chunk := resp.read(1 << 20):
                    out.write(chunk)
            os.replace(tmp, dest)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
    except Exception as e:  # no network / 404 / permission — soft-fail
        _failed_url_roots.add(root)
        warnings.warn(f"Could not download {url}: {e}")
        return None
    return dest


def find_weights(
    model_name: str,
    weights_dir: str | None,
    auto_download: bool = True,
) -> dict[str, np.ndarray] | None:
    """Probes for converted (or convertible) weights for a model.

    Search order: ``<model>.npz`` then the reference ``.pth`` filename
    (auto-converted and cached as ``.npz``), fully within ``weights_dir``
    BEFORE falling back to the default cache dir — an explicitly supplied
    checkpoint must never be shadowed by a stale auto-cached conversion.
    When nothing local is found and ``auto_download`` is set, the released
    checkpoint is fetched from the upstream URL (like the reference's
    torch.hub auto-download) and converted.  Returns None when nothing is
    found anywhere.
    """
    dirs = [d for d in (weights_dir, default_cache_dir()) if d]
    for d in dirs:
        npz = os.path.join(d, f"{model_name}.npz")
        if os.path.isfile(npz):
            return load_npz(npz)
        pth = os.path.join(d, PTH_FILENAMES.get(model_name, f"{model_name}.pth"))
        if os.path.isfile(pth):
            converted = convert_pth_file(pth)
            try:
                # Cache the conversion NEXT TO its source: a checkpoint from
                # an explicit weights_dir must not leak into the global
                # cache, where runs without that dir would silently pick it
                # up (observed with a synthetic validation checkpoint).
                save_npz(converted, os.path.join(d, f"{model_name}.npz"))
            except OSError:  # pragma: no cover - cache dir not writable
                pass
            return converted
    if auto_download:
        pth = download_pth(model_name)
        if pth is not None:
            converted = convert_pth_file(pth)
            try:
                save_npz(
                    converted, os.path.join(default_cache_dir(), f"{model_name}.npz")
                )
            except OSError:  # pragma: no cover - cache dir not writable
                pass
            return converted
    return None


def load_or_init(model_name: str, init_fn, weights_dir: str | None):
    """Returns converted pretrained params, or random-init params + warning.

    ``init_fn`` must return the full parameter dict (obtained by running the
    model's apply function in ``Params`` init mode).
    """
    found = find_weights(model_name, weights_dir)
    if found is not None:
        return found, True
    warnings.warn(
        f"No pretrained weights found for '{model_name}' "
        f"(looked in {weights_dir or '<unset>'} and {default_cache_dir()}; "
        f"place {PTH_FILENAMES.get(model_name)} or {model_name}.npz there — "
        f"upstream: {UPSTREAM_URL_ROOT}). Falling back to random "
        f"initialization: outputs will not be meaningful."
    )
    import contextlib

    import jax

    # The init fn runs the model's apply function *eagerly* to materialize
    # the parameter dict; pin it to the host backend — on a remote/tunneled
    # accelerator every eager op would be a round trip (minutes for the
    # 345-conv RRDB trunk).  JAX_PLATFORMS may exclude cpu entirely; the
    # pin is an optimization, so fall through rather than fail.
    try:
        ctx = jax.default_device(jax.devices("cpu")[0])
    except RuntimeError:
        ctx = contextlib.nullcontext()
    with ctx:
        return init_fn(), False
