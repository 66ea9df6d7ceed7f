"""Tests for the CLI: flag parsing, JSON-config merge, sentinels, main()."""

import json
import os

import numpy as np
import pytest

from face_crop_plus_tpu.__main__ import main, parse_args
from face_crop_plus_tpu.utils.io import imread_rgb, imwrite


def test_requires_input_dir():
    with pytest.raises(ValueError, match="Input directory"):
        parse_args(["-d", "cpu"])


def test_negative_thresholds_become_none():
    kw = parse_args(["-i", "x", "-dt", "-1", "-et", "-1", "-d", "cpu"])
    assert kw["det_threshold"] is None
    assert kw["enh_threshold"] is None


def test_defaults_match_reference():
    kw = parse_args(["-i", "x", "-d", "cpu"])
    assert kw["output_size"] == [256, 256]
    assert kw["resize_size"] == [1024, 1024]
    assert kw["face_factor"] == 0.65
    assert kw["strategy"] == "largest"
    assert kw["padding"] == "constant"
    assert kw["det_threshold"] == 0.6
    assert kw["enh_threshold"] is None  # default -1 -> disabled
    assert kw["batch_size"] == 8
    assert kw["num_processes"] == 1


def test_config_file_merge_and_override(tmp_path):
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({
        "input_dir": "from_cfg",
        "face_factor": 0.75,
        "strategy": "best",
        "device": "cpu",
    }))
    kw = parse_args(["-c", str(cfg)])
    assert kw["input_dir"] == "from_cfg"
    assert kw["face_factor"] == 0.75
    assert kw["strategy"] == "best"
    # Explicit flags override the config file.
    kw = parse_args(["-c", str(cfg), "-ff", "0.5", "-i", "cli_dir"])
    assert kw["face_factor"] == 0.5
    assert kw["input_dir"] == "cli_dir"


def test_json_group_flags():
    kw = parse_args(["-i", "x", "-d", "cpu", "-ag", '{"glasses": [6]}',
                     "-mg", '{"eyes": [4, 5]}'])
    assert kw["attr_groups"] == {"glasses": [6]}
    assert kw["mask_groups"] == {"eyes": [4, 5]}


def test_main_end_to_end(tmp_path, rng):
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    for i in range(2):
        imwrite(str(imgs / f"a{i}.png"),
                rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    lm = tmp_path / "lm.txt"
    lines = []
    for i in range(2):
        coords = " ".join(str(float(v)) for v in
                          (np.array([[20, 25], [40, 25], [30, 35], [22, 45], [38, 45]])
                           + rng.normal(0, 1, (5, 2))).reshape(-1))
        lines.append(f"a{i}.png {coords}")
    lm.write_text("\n".join(lines))

    out = tmp_path / "out"
    main(["-i", str(imgs), "-o", str(out), "-l", str(lm),
          "-dt", "-1", "-et", "-1", "-d", "cpu", "-s", "32"])
    assert sorted(os.listdir(out)) == ["a0.png", "a1.png"]
    assert imread_rgb(str(out / "a0.png")).shape == (32, 32, 3)


def test_main_clean_names_temp_dir(tmp_path, rng):
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    # "a<b.png" cleans to "ab.png"; the landmarks file refers to the
    # cleaned name (processing runs on the cleaned temp dir).
    imwrite(str(imgs / "a<b.png"), rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    lm = tmp_path / "lm.txt"
    lm.write_text("ab.png 20 25 40 25 30 35 22 45 38 45\n")

    out = tmp_path / "out"
    main(["-i", str(imgs), "-o", str(out), "-l", str(lm), "-cn",
          "-dt", "-1", "-et", "-1", "-d", "cpu", "-s", "32"])
    assert os.listdir(out) == ["ab.png"]
    assert not os.path.exists(str(imgs) + "_temp")  # temp dir cleaned up


def test_config_help_key_is_ignored(tmp_path):
    """A JSON config containing a 'help' key must not leak into kwargs
    (SUPPRESS-default actions are excluded, like the reference)."""
    import json as _json

    from face_crop_plus_tpu.__main__ import parse_args

    cfg = tmp_path / "c.json"
    cfg.write_text(_json.dumps({"help": True, "batch_size": 3}))
    kwargs = parse_args(["-i", str(tmp_path), "-c", str(cfg), "-dt", "-1"])
    assert "help" not in kwargs
    assert kwargs["batch_size"] == 3


def test_pack_flags_set_env(monkeypatch):
    import os

    monkeypatch.delenv("FCPT_PACK_UPLOAD", raising=False)
    monkeypatch.delenv("FCPT_PACK_FETCH", raising=False)
    # Default 'auto' leaves the env untouched (library-side auto gating).
    kw = parse_args(["-i", "x", "-d", "cpu"])
    assert "pack_upload" not in kw and "pack_fetch" not in kw
    assert "FCPT_PACK_UPLOAD" not in os.environ
    assert "FCPT_PACK_FETCH" not in os.environ
    # Explicit values map onto the env knobs the library reads.  parse_args
    # writes os.environ directly; monkeypatch.delenv on an *absent* key
    # records nothing to restore, so pop explicitly or the values leak into
    # every later test in the process.
    try:
        kw = parse_args(["-i", "x", "-d", "cpu", "-pu", "1", "-pf", "0"])
        assert "pack_upload" not in kw and "pack_fetch" not in kw
        assert os.environ["FCPT_PACK_UPLOAD"] == "1"
        assert os.environ["FCPT_PACK_FETCH"] == "0"
    finally:
        os.environ.pop("FCPT_PACK_UPLOAD", None)
        os.environ.pop("FCPT_PACK_FETCH", None)


def test_host_crop_flag_sets_env(monkeypatch):
    import os

    monkeypatch.delenv("FCPT_HOST_CROP", raising=False)
    kw = parse_args(["-i", "x", "-d", "cpu"])
    assert "host_crop" not in kw
    assert "FCPT_HOST_CROP" not in os.environ
    try:
        kw = parse_args(["-i", "x", "-d", "cpu", "-hc", "0"])
        assert "host_crop" not in kw
        assert os.environ["FCPT_HOST_CROP"] == "0"
    finally:
        os.environ.pop("FCPT_HOST_CROP", None)


def test_explicit_cpu_pins_platform(tmp_path, rng, monkeypatch):
    """`-d cpu` must pin JAX_PLATFORMS so accelerator backends (minutes of
    tunnel init on remote TPUs) are never touched — even over an ambient
    site-config value."""
    monkeypatch.setenv("JAX_PLATFORMS", "bogus-accel,cpu")
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    imwrite(str(imgs / "a.jpg"), img)
    lm = tmp_path / "lm.txt"
    pts = "20 20 44 20 32 32 22 44 42 44"
    lm.write_text(f"a.jpg {pts}\n")
    out = tmp_path / "out"
    main(["-i", str(imgs), "-o", str(out), "-l", str(lm),
          "-dt", "-1", "-et", "-1", "-d", "cpu"])
    assert os.environ["JAX_PLATFORMS"] == "cpu"
    assert sorted(os.listdir(out)) == ["a.jpg"]
