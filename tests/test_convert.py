"""Tests for the weight-conversion CLI and structural verification.

Builds torch state dicts with the exact key structure the reference
checkpoints have (by constructing equivalent torch modules), converts them,
and verifies against our model structure — this is the strongest available
proxy for pretrained-weight conversion fidelity without network access.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from face_crop_plus_tpu.convert import main as convert_main  # noqa: E402
from face_crop_plus_tpu.convert import verify_structure  # noqa: E402
from face_crop_plus_tpu.models.weights import convert_state_dict  # noqa: E402


def _torch_rrdb_state_dict(num_blocks=23):
    """State dict with the BSRGAN RRDBNet key structure (rrdb.py:52-62)."""

    def rdb():
        m = tnn.Module()
        m.conv1 = tnn.Conv2d(64, 32, 3, 1, 1)
        m.conv2 = tnn.Conv2d(96, 32, 3, 1, 1)
        m.conv3 = tnn.Conv2d(128, 32, 3, 1, 1)
        m.conv4 = tnn.Conv2d(160, 32, 3, 1, 1)
        m.conv5 = tnn.Conv2d(192, 64, 3, 1, 1)
        return m

    def rrdb():
        m = tnn.Module()
        m.RDB1, m.RDB2, m.RDB3 = rdb(), rdb(), rdb()
        return m

    net = tnn.Module()
    net.conv_first = tnn.Conv2d(3, 64, 3, 1, 1)
    net.RRDB_trunk = tnn.Sequential(*[rrdb() for _ in range(num_blocks)])
    net.trunk_conv = tnn.Conv2d(64, 64, 3, 1, 1)
    net.upconv1 = tnn.Conv2d(64, 64, 3, 1, 1)
    net.upconv2 = tnn.Conv2d(64, 64, 3, 1, 1)
    net.HRconv = tnn.Conv2d(64, 64, 3, 1, 1)
    net.conv_last = tnn.Conv2d(64, 3, 3, 1, 1)
    return net.state_dict()


def test_rrdb_structure_roundtrip():
    sd = _torch_rrdb_state_dict()
    converted = convert_state_dict(sd)
    problems = verify_structure(converted, "rrdb")
    assert problems == [], problems[:10]


def test_verify_catches_missing_and_mismatch():
    sd = _torch_rrdb_state_dict()
    converted = convert_state_dict(sd)
    del converted["conv_first.weight"]
    converted["bogus.weight"] = np.zeros((1, 1, 1, 1), np.float32)
    converted["conv_last.bias"] = np.zeros((7,), np.float32)
    problems = verify_structure(converted, "rrdb")
    kinds = "\n".join(problems)
    assert "missing from checkpoint: conv_first.weight" in kinds
    assert "unexpected in checkpoint: bogus.weight" in kinds
    assert "shape mismatch: conv_last.bias" in kinds


def test_cli_convert_and_verify(tmp_path):
    sd = _torch_rrdb_state_dict()
    pth = tmp_path / "bsrgan_x4_enhancer.pth"
    torch.save(sd, str(pth))
    out = tmp_path / "rrdb.npz"
    rc = convert_main(["--pth", str(pth), "--out", str(out), "--verify"])
    assert rc == 0
    assert out.exists()
    with np.load(out) as z:
        assert "conv_first.weight" in z.files
        assert z["conv_first.weight"].shape == (3, 3, 3, 64)  # HWIO


def test_cli_infers_model_from_filename(tmp_path, monkeypatch):
    sd = _torch_rrdb_state_dict()
    pth = tmp_path / "bsrgan_x4_enhancer.pth"
    torch.save(sd, str(pth))
    monkeypatch.setenv("FCPT_CACHE_DIR", str(tmp_path / "cache"))
    rc = convert_main(["--pth", str(pth)])
    assert rc == 0
    assert (tmp_path / "cache" / "rrdb.npz").exists()


# ---------------------------------------------------------------------------
# Auto-download (reference _layers.py:27-35 equivalent), served via file://
# ---------------------------------------------------------------------------


def _small_pth(path):
    """Tiny state dict under the reference's released filename."""
    sd = {
        "conv_first.weight": torch.zeros(64, 3, 3, 3),
        "conv_first.bias": torch.arange(64, dtype=torch.float32),
    }
    torch.save(sd, str(path))


def test_download_pth_file_url(tmp_path, monkeypatch):
    monkeypatch.setenv("FCPT_NO_DOWNLOAD", "0")
    from face_crop_plus_tpu.models.weights import download_pth

    srv = tmp_path / "srv"
    srv.mkdir()
    _small_pth(srv / "bsrgan_x4_enhancer.pth")
    cache = tmp_path / "cache"
    monkeypatch.setenv("FCPT_CACHE_DIR", str(cache))
    monkeypatch.setenv("FCPT_WEIGHTS_URL", srv.as_uri() + "/")

    got = download_pth("rrdb")
    assert got == str(cache / "bsrgan_x4_enhancer.pth")
    assert (cache / "bsrgan_x4_enhancer.pth").is_file()

    # Second call must hit the local cache, not the "network".
    (srv / "bsrgan_x4_enhancer.pth").unlink()
    assert download_pth("rrdb") == got


def test_find_weights_auto_downloads_and_converts(tmp_path, monkeypatch):
    monkeypatch.setenv("FCPT_NO_DOWNLOAD", "0")
    from face_crop_plus_tpu.models.weights import find_weights

    srv = tmp_path / "srv"
    srv.mkdir()
    _small_pth(srv / "bsrgan_x4_enhancer.pth")
    cache = tmp_path / "cache"
    monkeypatch.setenv("FCPT_CACHE_DIR", str(cache))
    monkeypatch.setenv("FCPT_WEIGHTS_URL", srv.as_uri() + "/")

    params = find_weights("rrdb", None)
    assert params is not None
    assert params["conv_first.weight"].shape == (3, 3, 3, 64)  # OIHW → HWIO
    np.testing.assert_array_equal(params["conv_first.bias"], np.arange(64))
    # Converted result is cached; subsequent lookups need no .pth at all.
    assert (cache / "rrdb.npz").is_file()
    (cache / "bsrgan_x4_enhancer.pth").unlink()
    again = find_weights("rrdb", None)
    assert again is not None and "conv_first.weight" in again


def test_download_disabled_by_env(tmp_path, monkeypatch):
    from face_crop_plus_tpu.models.weights import download_pth

    monkeypatch.setenv("FCPT_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.setenv("FCPT_NO_DOWNLOAD", "1")
    assert download_pth("rrdb") is None


def test_download_failure_is_soft(tmp_path, monkeypatch):
    monkeypatch.setenv("FCPT_NO_DOWNLOAD", "0")
    import warnings as _warnings

    from face_crop_plus_tpu.models.weights import download_pth, load_or_init

    monkeypatch.setenv("FCPT_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.setenv(
        "FCPT_WEIGHTS_URL", (tmp_path / "nope").as_uri() + "/"
    )
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        assert download_pth("rrdb") is None
    assert any("Could not download" in str(x.message) for x in w)
    # No partial files left behind.
    leftovers = list((tmp_path / "cache").glob("*.part")) if (tmp_path / "cache").is_dir() else []
    assert leftovers == []

    sentinel = {"w": np.zeros(1, np.float32)}
    with _warnings.catch_warnings(record=True):
        _warnings.simplefilter("always")
        params, pretrained = load_or_init("rrdb", lambda: sentinel, None)
    assert params is sentinel and pretrained is False
