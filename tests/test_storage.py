"""Storage backend + profiling utility tests."""

import os

import numpy as np
import pytest

from msm_tpu.io.npy import load_complex_pair
from msm_tpu.io.storage import LocalNpyBackend, ObjectBackend
from msm_tpu.utils.profiling import ProgressReporter, StepTimer


def test_local_backend_layout(tmp_path, rng):
    be = LocalNpyBackend(str(tmp_path))
    arr = rng.standard_normal((4, 4, 1, 1)) + 1j * rng.standard_normal((4, 4, 1, 1))
    base = be.submit_grid("simA", "psi", 7, arr)
    be.close()
    assert base.endswith(os.path.join("simA", "psi_00007"))
    np.testing.assert_allclose(load_complex_pair(base), arr)


def test_object_backend_rotation(tmp_path, rng):
    be = ObjectBackend(str(tmp_path), accounts=("acc0", "acc1", "acc2"))
    # round-robin by stream seed (reference io.rs:383-401)
    assert be.account_for(0) == "acc0"
    assert be.account_for(4) == "acc1"
    assert be.account_for(None) == "acc0"
    arr = rng.standard_normal((4, 4, 1, 1)) + 0j
    base = be.submit_grid("simB", "psi", 3, arr, seed=5)
    be.close()
    # flat key in the account namespace: {sim}_{field}_{dump:05}
    assert base.endswith(os.path.join("acc2", "simB_psi_00003"))
    np.testing.assert_allclose(load_complex_pair(base), arr)


def test_step_timer():
    t = StepTimer(cells_per_step=1000)
    t.start()
    t.stop(n_steps=5)
    assert t.steps == 5
    assert t.steps_per_s > 0
    assert t.cell_updates_per_s == pytest.approx(t.steps_per_s * 1000)
    assert "steps/s" in t.summary()


def test_progress_reporter(capsys):
    import io

    buf = io.StringIO()
    pr = ProgressReporter(total_dumps=10, sim_name="x", stream=buf)
    pr.update(5, sim_time=1.25)
    pr.update(7, redshift=3.0)
    pr.finish()
    out = buf.getvalue()
    assert "5/10" in out
    assert "t = 1.25" in out
    assert "z = 3" in out
    assert "finished" in out
