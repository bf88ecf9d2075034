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


class _LoopbackStore:
    """In-process HTTP object store: PUT stores bytes, repeated PUT
    overwrites. Can fail the first N requests to exercise retries."""

    def __init__(self, fail_first: int = 0):
        import http.server
        import threading

        store = self
        self.objects: dict[str, bytes] = {}
        self.put_count = 0
        self.fail_remaining = fail_first

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_PUT(self):  # noqa: N802
                store.put_count += 1
                if store.fail_remaining > 0:
                    store.fail_remaining -= 1
                    self.send_response(503)
                    self.end_headers()
                    return
                n = int(self.headers["Content-Length"])
                store.objects[self.path] = self.rfile.read(n)
                self.send_response(201)
                self.end_headers()

            def log_message(self, *a):
                pass

        self.server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.server.server_address[1]}"
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()

    def close(self):
        self.server.shutdown()
        self.server.server_close()

    def read_array(self, path: str):
        import io

        return np.lib.format.read_array(io.BytesIO(self.objects[path]))


def test_http_transport_roundtrip(rng):
    """A dump round-trips through a real HTTP PUT (reference upload
    semantics: io.rs:410-465 — overwrite, async, URL returned)."""
    from msm_tpu.io.storage import HttpTransport

    store = _LoopbackStore()
    try:
        be = ObjectBackend(
            "unused-root",
            accounts=("acc0", "acc1"),
            transport=HttpTransport(store.url, retries=2, backoff_s=0.01),
        )
        arr = rng.standard_normal((4, 4, 1, 1)) + 1j * rng.standard_normal(
            (4, 4, 1, 1)
        )
        url = be.submit_grid("simC", "psi", 2, arr, seed=3)
        be.close()
        assert url == f"{store.url}/acc1/simC_psi_00002"
        got = store.read_array("/acc1/simC_psi_00002_real") + 1j * store.read_array(
            "/acc1/simC_psi_00002_imag"
        )
        np.testing.assert_allclose(got, arr)
        # overwrite: a second upload to the same key replaces the object
        be2 = ObjectBackend(
            "unused-root",
            accounts=("acc0", "acc1"),
            transport=HttpTransport(store.url, retries=2, backoff_s=0.01),
        )
        be2.submit_grid("simC", "psi", 2, arr * 2, seed=3)
        be2.close()
        got2 = store.read_array("/acc1/simC_psi_00002_real")
        np.testing.assert_allclose(got2, (arr * 2).real)
    finally:
        store.close()


def test_http_transport_retries(rng):
    from msm_tpu.io.storage import HttpTransport

    store = _LoopbackStore(fail_first=1)
    try:
        be = ObjectBackend(
            "unused-root",
            transport=HttpTransport(store.url, retries=3, backoff_s=0.01),
        )
        arr = rng.standard_normal((2, 2, 1, 1)) + 0j
        be.submit_grid("simR", "psi", 0, arr)
        be.close()  # raises if the retry did not recover
        assert store.put_count >= 3  # 1 failed + 2 planes
        np.testing.assert_allclose(
            store.read_array("/account0/simR_psi_00000_real"), arr.real
        )
    finally:
        store.close()


def test_http_transport_gives_up(rng):
    from msm_tpu.io.storage import HttpTransport

    store = _LoopbackStore(fail_first=100)
    try:
        be = ObjectBackend(
            "unused-root",
            transport=HttpTransport(store.url, retries=2, backoff_s=0.01),
        )
        be.submit_grid("simF", "psi", 0, np.zeros((2, 2, 1, 1)) + 0j)
        with pytest.raises(OSError):
            be.close()
    finally:
        store.close()


def test_manifest_records_object_url(tmp_path, rng):
    """The driver records the upload destination in the manifest (the
    reference returns the grid URL from upload_grid; io.rs:427-465)."""
    import json

    from msm_tpu.io.storage import HttpTransport
    from msm_tpu.simulator import SimulationRun
    from msm_tpu import config as cfg

    store = _LoopbackStore()
    try:
        toml = cfg.parse_toml_dict(
            {
                "axis_length": 1.0,
                "final_sim_time": 1.0,
                "cfl": 0.5,
                "num_data_dumps": 1,
                "total_mass": 1.0,
                "sim_name": "url-sim",
                "k2_cutoff": 0.95,
                "alias_threshold": 0.02,
                "dims": 2,
                "size": 4,
                "ics": {
                    "type": "SphericalTophat",
                    "radius": 0.3,
                    "slope": 50,
                    "delta": 1,
                },
                "hbar_": 0.02,
            }
        )
        params = next(iter(cfg.iter_stream_parameters(toml)))
        be = ObjectBackend(
            str(tmp_path), transport=HttpTransport(store.url, retries=2)
        )
        run = SimulationRun(params, str(tmp_path), backend=be)
        psi = rng.standard_normal(params.shape) + 0j
        run.dump_field(psi, 0)
        be.wait()
        run.write_manifest(
            {"current_dumps": 0, "time": 0.0, "n_steps": 0, "aliased": False}
        )
        m = json.load(open(tmp_path / "url-sim" / "manifest.json"))
        assert m["psi_url"] == f"{store.url}/account0/url-sim_psi_00000"
    finally:
        store.close()
