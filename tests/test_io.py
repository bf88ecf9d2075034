"""I/O tests (mirrors `simulator/tests/io.rs:1-61`): npy pair round-trips,
exact reference filenames, async writer, checkpoint manifests."""

import os

import numpy as np
import pytest

from msm_tpu.io import checkpoint, npy


def test_write_npy_exact_name(tmp_path):
    path = str(tmp_path / "psi_00000_real")
    arr = np.arange(24.0).reshape(2, 3, 4, 1)
    npy.write_npy_exact(path, arr)
    assert os.path.exists(path)  # no .npy appended
    assert not os.path.exists(path + ".npy")
    back = npy.read_npy_exact(path)
    np.testing.assert_array_equal(back, arr)
    # must be a valid npy file numpy itself can open
    with open(path, "rb") as f:
        np.testing.assert_array_equal(np.lib.format.read_array(f), arr)


def test_complex_pair_roundtrip(tmp_path, rng):
    base = str(tmp_path / "psi_00042")
    arr = (rng.standard_normal((4, 4, 4, 1)) + 1j * rng.standard_normal((4, 4, 4, 1)))
    npy.write_complex_pair(base, arr)
    assert os.path.exists(base + "_real")
    assert os.path.exists(base + "_imag")
    back = npy.load_complex_pair(base)
    np.testing.assert_allclose(back, arr)


def test_async_writer(tmp_path, rng):
    grids = {
        str(tmp_path / f"g_{i:05d}"): rng.standard_normal((8, 8))
        + 1j * rng.standard_normal((8, 8))
        for i in range(40)
    }
    with npy.AsyncGridWriter(max_concurrent=4, workers=4) as w:
        for base, arr in grids.items():
            w.submit(base, arr)
        w.wait()
    for base, arr in grids.items():
        np.testing.assert_allclose(npy.load_complex_pair(base), arr)


def test_async_writer_surfaces_pruned_failure(tmp_path, rng):
    """A failed task must raise at wait() even if later submits pruned its
    completed future from the pending list (silent-data-loss regression:
    a give-up upload followed by more dumps must not exit 0)."""
    import time

    def boom():
        raise IOError("upload gave up")

    arr = rng.standard_normal((4, 4)) + 0j
    with pytest.raises(IOError, match="upload gave up"):
        with npy.AsyncGridWriter(max_concurrent=4, workers=2) as w:
            w.submit_task(boom)
            time.sleep(0.2)  # let the failure complete before the prune
            for i in range(8):
                w.submit(str(tmp_path / f"ok_{i:05d}"), arr)
            w.wait()
    # the successful writes still landed
    for i in range(8):
        assert os.path.exists(str(tmp_path / f"ok_{i:05d}") + "_real")


def test_dump_paths(tmp_path):
    d = npy.dump_dir("mysim", str(tmp_path))
    assert os.path.isdir(d)
    assert d.endswith(os.path.join("mysim"))
    assert npy.psi_path(d, 7).endswith(os.path.join("mysim", "psi_00007"))
    assert npy.psi_path(d, 7, "potential").endswith("potential_00007")


def test_manifest_roundtrip(tmp_path):
    d = str(tmp_path)
    assert checkpoint.load_manifest(d) is None
    checkpoint.write_manifest(
        d, current_dumps=3, time=1.5, tau=0.2, a=0.5, n_steps=77, wall_time_ms=12.5
    )
    m = checkpoint.load_manifest(d)
    assert m["current_dumps"] == 3
    assert m["time"] == 1.5
    assert m["n_steps"] == 77
