"""Tests for OS-safe filename cleaning."""

import os

from face_crop_plus_tpu.utils.names import clean_names


def _touch(d, name):
    with open(os.path.join(d, name), "w") as f:
        f.write("x")


def test_clean_names_copy(tmp_path):
    src = tmp_path / "in"
    dst = tmp_path / "out"
    src.mkdir()
    _touch(src, "hello world.jpg")
    _touch(src, "a<>b.jpg")
    clean_names(str(src), str(dst), desc=None)
    names = sorted(os.listdir(dst))
    assert "hello world.jpg" in names
    assert "ab.jpg" in names


def test_clean_names_dedup(tmp_path):
    src = tmp_path / "in"
    dst = tmp_path / "out"
    src.mkdir()
    # Different raw names collapsing to the same clean name.
    _touch(src, "ab.jpg")
    _touch(src, "a!b.jpg")
    _touch(src, "a?b.jpg")
    clean_names(str(src), str(dst), desc=None)
    names = sorted(os.listdir(dst))
    assert len(names) == 3
    assert len(set(n.lower() for n in names)) == 3


def test_clean_names_inplace_nonascii(tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _touch(src, "České.jpg")
    clean_names(str(src), None, desc=None)
    names = os.listdir(src)
    assert len(names) == 1
    assert names[0].isascii()


def test_clean_names_truncation(tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    long_name = "x" * 180 + ".jpg"
    _touch(src, long_name)
    clean_names(str(src), None, max_chars=100, desc=None)
    names = os.listdir(src)
    assert len(names) == 1
    # Name budget is max_chars minus the directory length (reference rule).
    assert len(names[0]) <= 100 - len(str(src))


def test_inplace_rename_never_overwrites_pending_file(tmp_path):
    """'ä.jpg' cleaning to 'a.jpg' must not clobber an existing a.jpg."""
    a = tmp_path / "a.jpg"
    a.write_bytes(b"original")
    (tmp_path / "ä.jpg").write_bytes(b"umlaut")
    clean_names(str(tmp_path), desc=None)
    files = sorted(os.listdir(tmp_path))
    contents = sorted((tmp_path / f).read_bytes() for f in files)
    assert len(files) == 2
    assert contents == [b"original", b"umlaut"]  # both payloads survive


def test_truncation_applies_to_transliterated_name(tmp_path):
    """CJK names lengthen under transliteration; the budget must apply to
    the cleaned name, not the original."""
    name = "北京市朝阪" * 4 + ".jpg"  # short original
    (tmp_path / name).write_bytes(b"x")
    clean_names(str(tmp_path), max_chars=len(str(tmp_path)) + 20, desc=None)
    out = os.listdir(tmp_path)[0]
    assert len(out) <= 20


def test_inplace_collision_keeps_unchanged_files_name(tmp_path):
    """'ä.jpg' colliding with a pending 'a.jpg' must suffix only itself;
    the file already holding its clean name keeps it (stable across
    listdir orders — matters for skip_existing resume)."""
    import os

    from face_crop_plus_tpu.utils.names import clean_names

    (tmp_path / "ä.jpg").write_bytes(b"umlaut")
    (tmp_path / "a.jpg").write_bytes(b"plain")
    clean_names(str(tmp_path), desc=None)
    names = sorted(os.listdir(tmp_path))
    assert names == ["a-1.jpg", "a.jpg"], names
    assert (tmp_path / "a.jpg").read_bytes() == b"plain"
    assert (tmp_path / "a-1.jpg").read_bytes() == b"umlaut"


def test_pending_guard_survives_case_twins(tmp_path):
    """Two case-differing pending files must each keep the rename guard.

    'A.jpg' and 'a.jpg' share a lowercased key; processing the first twin
    must not drop the guard while the second is still pending — otherwise
    'ä.jpg' cleaning to 'a.jpg' could rename onto the unprocessed twin.
    """
    payloads = {"A.jpg": b"upper", "a.jpg": b"lower", "ä.jpg": b"umlaut"}
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    clean_names(str(tmp_path), desc=None)
    files = sorted(os.listdir(tmp_path))
    contents = sorted((tmp_path / f).read_bytes() for f in files)
    assert len(files) == 3
    assert contents == sorted(payloads.values())  # every payload survives
