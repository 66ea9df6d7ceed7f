"""Multi-host file-list sharding: shards partition the directory exactly."""

import os

import numpy as np

from face_crop_plus_tpu import Cropper
from face_crop_plus_tpu.utils.io import imwrite


def test_file_shards_partition(tmp_path, rng):
    d = tmp_path / "imgs"
    d.mkdir()
    names = []
    for i in range(10):
        n = f"x{i}.png"
        imwrite(str(d / n), rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
        names.append(n)
    lm = tmp_path / "lm.txt"
    lm.write_text(
        "\n".join(f"{n} 8 10 24 10 16 18 10 26 22 26" for n in names)
    )

    outs = []
    for shard in range(3):
        out = tmp_path / f"out{shard}"
        c = Cropper(
            output_size=16,
            landmarks=str(lm),
            det_threshold=None,
            enh_threshold=None,
            device="cpu",
            batch_size=4,
        )
        c.process_dir(str(d), str(out), desc=None, shard_index=shard, num_shards=3)
        outs.append(set(os.listdir(out)))

    # Disjoint and complete.
    assert outs[0] | outs[1] | outs[2] == set(names)
    assert not (outs[0] & outs[1]) and not (outs[1] & outs[2]) and not (outs[0] & outs[2])


def test_two_process_cli_shards(tmp_path, rng):
    """Documented two-process demo: each OS process runs the CLI with its
    own shard; the shards together produce exactly the full output set."""
    import subprocess
    import sys

    d = tmp_path / "imgs"
    d.mkdir()
    names = [f"p{i}.png" for i in range(6)]
    for n in names:
        imwrite(str(d / n), rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    lm = tmp_path / "lm.txt"
    lm.write_text("\n".join(f"{n} 8 10 24 10 16 18 10 26 22 26" for n in names))

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    procs = []
    for shard in range(2):
        out = tmp_path / f"out{shard}"
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "face_crop_plus_tpu",
             "-i", str(d), "-o", str(out), "-l", str(lm),
             "-dt", "-1", "-et", "-1", "-d", "cpu",
             "--shard-index", str(shard), "--num-shards", "2"],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        ))
    for p in procs:
        assert p.wait(timeout=300) == 0

    a = set(os.listdir(tmp_path / "out0"))
    b = set(os.listdir(tmp_path / "out1"))
    assert a | b == set(names) and not (a & b)


def test_host_shard_single_process():
    from face_crop_plus_tpu.parallel import host_shard, init_distributed

    # Single process: init is a soft no-op and the shard covers everything.
    assert init_distributed() is False
    assert host_shard() == (0, 1)
