"""process_dir(skip_existing=True): cheap resume for interrupted runs.

An addition over the reference (SURVEY §5.4: it has no pipeline resume —
re-running re-processes everything): sources whose crop already exists in
the output directory are filtered from the work list before batching.
"""

import os
import time

import numpy as np

from face_crop_plus_tpu import Cropper
from face_crop_plus_tpu.utils.io import imwrite


def _make_inputs(tmp_path, rng, n=6, ext="png"):
    d = tmp_path / "imgs"
    d.mkdir()
    names = [f"f{i}.{ext}" for i in range(n)]
    for name in names:
        imwrite(str(d / name), rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    lm = tmp_path / "lm.txt"
    lm.write_text("\n".join(f"{n} 8 10 24 10 16 18 10 26 22 26" for n in names))
    return d, lm, names


def _cropper(lm, **kw):
    return Cropper(
        output_size=16,
        landmarks=str(lm),
        det_threshold=None,
        enh_threshold=None,
        device="cpu",
        batch_size=4,
        **kw,
    )


def test_skip_existing_resumes_partial_run(tmp_path, rng):
    d, lm, names = _make_inputs(tmp_path, rng)
    out = tmp_path / "out"

    # Simulate an interrupted run: process only the first half.
    c = _cropper(lm)
    half = names[:3]
    c.process_batch(half, str(d), str(out))
    assert sorted(os.listdir(out)) == sorted(half)
    mtimes = {n: os.path.getmtime(out / n) for n in half}

    time.sleep(0.05)
    c.process_dir(str(d), str(out), desc=None, skip_existing=True)
    assert sorted(os.listdir(out)) == sorted(names)
    # The already-done crops were not rewritten.
    for n in half:
        assert os.path.getmtime(out / n) == mtimes[n]


def test_skip_existing_all_done_is_noop(tmp_path, rng):
    d, lm, names = _make_inputs(tmp_path, rng)
    out = tmp_path / "out"
    c = _cropper(lm)
    c.process_dir(str(d), str(out), desc=None)
    first = {n: os.path.getmtime(out / n) for n in names}
    time.sleep(0.05)
    c.process_dir(str(d), str(out), desc=None, skip_existing=True)
    assert {n: os.path.getmtime(out / n) for n in names} == first


def test_skip_existing_strategy_all_uses_occurrence_suffix(tmp_path, rng):
    d, lm, names = _make_inputs(tmp_path, rng)
    out = tmp_path / "out"
    c = _cropper(lm, strategy="all")
    c.process_batch(names[:2], str(d), str(out))
    done = set(os.listdir(out))
    assert done == {"f0_0.png", "f1_0.png"}

    c.process_dir(str(d), str(out), desc=None, skip_existing=True)
    assert sorted(os.listdir(out)) == [f"f{i}_0.png" for i in range(6)]


def test_skip_existing_off_by_default_rewrites(tmp_path, rng):
    d, lm, names = _make_inputs(tmp_path, rng)
    out = tmp_path / "out"
    c = _cropper(lm)
    c.process_dir(str(d), str(out), desc=None)
    first = {n: os.path.getmtime(out / n) for n in names}
    time.sleep(0.05)
    c.process_dir(str(d), str(out), desc=None)
    assert any(
        os.path.getmtime(out / n) > first[n] for n in names
    )


def test_skip_existing_cli_flag(tmp_path, rng):
    from face_crop_plus_tpu.__main__ import parse_args

    kwargs = parse_args(["-i", str(tmp_path), "-se", "-dt", "-1"])
    assert kwargs["skip_existing"] is True
    kwargs = parse_args(["-i", str(tmp_path), "-dt", "-1"])
    assert kwargs["skip_existing"] is False


def test_skip_existing_filters_after_shard_split(tmp_path, rng):
    """Resume must prune each host's own shard (filtering before the strided
    split would skew positions and could orphan files between hosts)."""
    d, lm, names = _make_inputs(tmp_path, rng, n=8)
    out = tmp_path / "out"

    # Complete half the files (even indices, i.e. shard 0 of 2).
    c = _cropper(lm)
    c.process_dir(str(d), str(out), desc=None, shard_index=0, num_shards=2)
    assert sorted(os.listdir(out)) == sorted(names[0::2])

    # Shard 1 resumes with skip_existing: it must still process exactly the
    # odd-index files, not a re-strided subset of the unprocessed ones.
    c.process_dir(str(d), str(out), desc=None, shard_index=1, num_shards=2,
                  skip_existing=True)
    assert sorted(os.listdir(out)) == sorted(names)


def test_imwrite_atomic_no_temp_residue(tmp_path, rng):
    from face_crop_plus_tpu.utils.io import imread_rgb, imwrite

    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    path = tmp_path / "x.png"
    assert imwrite(str(path), img)
    assert sorted(os.listdir(tmp_path)) == ["x.png"]
    np.testing.assert_array_equal(imread_rgb(str(path)), img)


def test_occurrence_zero_written_last(tmp_path, rng, monkeypatch):
    """save_group writes face _0 after a source's other faces.

    The resume filter treats the existence of occurrence 0 as "source
    done"; under strategy="all" a kill between _0 and _1 would otherwise
    silently lose _1+ on every resume (ADVICE r2).
    """
    import face_crop_plus_tpu.cropper as crmod

    order = []
    real = crmod.imwrite

    def recording(path, img):
        order.append(os.path.basename(path))
        return real(path, img)

    monkeypatch.setattr(crmod, "imwrite", recording)
    c = Cropper(strategy="all", det_threshold=None, enh_threshold=None,
                device="cpu")
    faces = rng.integers(0, 255, (4, 8, 8, 3), dtype=np.uint8)
    c.save_group(faces, ["s.jpg", "s.jpg", "s.jpg", "t.jpg"], str(tmp_path))
    assert set(order) == {"s_0.jpg", "s_1.jpg", "s_2.jpg", "t_0.jpg"}
    assert order.index("s_0.jpg") > order.index("s_1.jpg")
    assert order.index("s_0.jpg") > order.index("s_2.jpg")
