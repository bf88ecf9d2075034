"""Synthesizer tests: ensemble averages, the unnormalized-psik file
convention, and the Qx quantum-breaking scalar.

Counterpart of `synthesizer/src/lib.rs` / `main.rs` behavior, which has no
automated tests in the reference (SURVEY.md §4)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from msm_tpu import config as cfg
from msm_tpu import synthesis
from msm_tpu.io.npy import load_complex_pair, write_complex_pair


def _make_stream_dumps(root, name, n_streams, dumps, size, rng):
    """Write synthetic psi dumps for n_streams streams; return the fields."""
    fields = {}
    for s in range(1, n_streams + 1):
        d = os.path.join(root, f"{name}-stream{s:05d}")
        os.makedirs(d, exist_ok=True)
        for dump in range(dumps + 1):
            psi = rng.standard_normal((size, size)) + 1j * rng.standard_normal(
                (size, size)
            )
            fields[(s, dump)] = psi
            write_complex_pair(
                os.path.join(d, f"psi_{dump:05d}"), psi.reshape(size, size, 1, 1)
            )
    return fields


def test_analyze_sims_averages(tmp_path, rng):
    size, n_streams, dumps = 8, 5, 2
    root = str(tmp_path)
    base = os.path.join(root, "syn")
    fields = _make_stream_dumps(root, "syn", n_streams, dumps, size, rng)

    fns = synthesis.SynthesisFunctions()
    synthesis.analyze_sims(
        fns, base, range(dumps + 1), dims=2, dtype=jnp.complex128, stream_chunk=2
    )

    out = base + "-combined"
    for dump in range(dumps + 1):
        streams = [fields[(s, dump)] for s in range(1, n_streams + 1)]
        expected_psi = np.mean(streams, axis=0)
        got = load_complex_pair(os.path.join(out, f"psi_{dump:05d}")).reshape(
            size, size
        )
        np.testing.assert_allclose(got, expected_psi, atol=1e-12)

        expected_psi2 = np.mean([np.abs(s) ** 2 for s in streams], axis=0)
        got2 = load_complex_pair(os.path.join(out, f"psi2_{dump:05d}")).reshape(
            size, size
        )
        np.testing.assert_allclose(got2.real, expected_psi2, atol=1e-12)

        # psik uses the UNnormalized FFT convention (lib.rs:206-213)
        expected_psik = np.mean(
            [np.fft.fftn(s, norm="backward") for s in streams], axis=0
        )
        gotk = load_complex_pair(os.path.join(out, f"psik_{dump:05d}")).reshape(
            size, size
        )
        np.testing.assert_allclose(gotk, expected_psik, atol=1e-10)


def test_qx_series(tmp_path, rng):
    size, n_streams, dumps = 8, 4, 1
    root = str(tmp_path)
    base = os.path.join(root, "qx")
    fields = _make_stream_dumps(root, "qx", n_streams, dumps, size, rng)

    dv = 0.25
    fns = synthesis.SynthesisFunctions()
    fns.post_scalar_functions["Qx"] = synthesis.qx_post_scalar(dv)
    synthesis.analyze_sims(
        fns, base, range(dumps + 1), dims=2, dtype=jnp.complex128
    )
    result = synthesis.post_combine(fns, base, range(dumps + 1))

    assert result["Qx"].shape == (dumps + 1, 1, 1, 1)
    for dump in range(dumps + 1):
        streams = [fields[(s, dump)] for s in range(1, n_streams + 1)]
        psi_bar = np.mean(streams, axis=0)
        psi2_bar = np.mean([np.abs(s) ** 2 for s in streams], axis=0)
        expected = np.sum(psi2_bar - np.abs(psi_bar) ** 2) * dv
        assert result["Qx"][dump, 0, 0, 0].real == pytest.approx(
            expected, rel=1e-10
        )
    # series file exists in the combined dir
    series = load_complex_pair(os.path.join(base + "-combined", "Qx"))
    np.testing.assert_allclose(series, result["Qx"])


def test_full_pipeline_on_simulated_data(tmp_path):
    """simulate -> synthesize end-to-end on a tiny sampled config."""
    toml = cfg.parse_toml_dict(
        {
            "axis_length": 30,
            "final_sim_time": 0.5,
            "cfl": 0.5,
            "num_data_dumps": 2,
            "total_mass": 1e8,
            "ntot": 1e6,
            "hbar_": 0.05,
            "sim_name": "pipe",
            "k2_cutoff": 0.95,
            "alias_threshold": 0.9,
            "dims": 2,
            "size": 16,
            "ics": {"type": "SphericalTophat", "radius": 5.0, "slope": 50, "delta": 10},
            "sampling": {"seeds": "1 to 4", "scheme": "Wigner"},
        }
    )
    from msm_tpu import simulator

    root = str(tmp_path / "sim-data")
    simulator.run_config(toml, dtype=jnp.complex128, data_root=root)
    result = synthesis.synthesize_toml(toml, data_root=root, dtype=jnp.complex128)
    qx = result["Qx"][:, 0, 0, 0]
    assert qx.shape == (3,)
    # Qx is real and non-negative up to roundoff (it is a variance sum)
    assert np.all(qx.real > -1e-12)
    assert np.all(np.abs(qx.imag) < 1e-12)


def _run_online_vs_offline(tmp_path, overrides, mesh="none", check_qx=True):
    """Run the same config with --online-synthesis and with the offline
    synthesizer; assert the `-combined/` files (and Qx series) are equal.
    Shared by the plain, mesh, and padded-mesh variants."""
    spec = {
        "axis_length": 30,
        "final_sim_time": 0.5,
        "num_data_dumps": 2,
        "cfl": 0.5,
        "total_mass": 1e8,
        "ntot": 1e6,
        "hbar_": 0.05,
        "sim_name": "online",
        "k2_cutoff": 0.95,
        "alias_threshold": 0.9,
        "dims": 2,
        "size": 16,
        "ics": {"type": "SphericalTophat", "radius": 5.0, "slope": 50, "delta": 10},
        "sampling": {"seeds": "1 to 4", "scheme": "Wigner"},
    }
    spec.update(overrides)
    toml = cfg.parse_toml_dict(spec)
    from msm_tpu import simulator

    root_on = str(tmp_path / "on")
    root_off = str(tmp_path / "off")
    simulator.run_config(
        toml, dtype=jnp.complex128, data_root=root_on, online_synthesis=True,
        mesh=mesh,
    )
    simulator.run_config(toml, dtype=jnp.complex128, data_root=root_off)
    synthesis.synthesize_toml(toml, data_root=root_off, dtype=jnp.complex128)

    for dump in range(spec["num_data_dumps"] + 1):
        for name in ("psi", "psi2", "psik", "psik2"):
            a = load_complex_pair(
                os.path.join(root_on, "online-combined", f"{name}_{dump:05d}")
            )
            b = load_complex_pair(
                os.path.join(root_off, "online-combined", f"{name}_{dump:05d}")
            )
            np.testing.assert_allclose(a, b, atol=1e-11, err_msg=f"{name} dump {dump}")
    if check_qx:
        qa = load_complex_pair(os.path.join(root_on, "online-combined", "Qx"))
        qb = load_complex_pair(os.path.join(root_off, "online-combined", "Qx"))
        np.testing.assert_allclose(qa, qb, atol=1e-11)


def test_online_matches_offline(tmp_path):
    """Online (in-run, on-device) synthesis must reproduce the offline
    combiner's files exactly (single-device blocked in-payload path)."""
    _run_online_vs_offline(tmp_path, {})


@pytest.mark.parametrize("kblock", ["2", "1"])
def test_online_mesh_padded_batch(tmp_path, monkeypatch, kblock):
    """Mesh online synthesis with an internally PADDED stream batch: size
    12 is indivisible by every workable space factor of 8 devices for 3
    runs (only n_space=8 pairs with n_stream=1, and 12 % 8 != 0), so
    mesh=auto pads 3 runs -> 8 rows (MFT copies) on a stream-only mesh.
    The padded rows sit at global index >= n_runs and must stay out of the
    combine mean: kblock=2 exercises the in-payload global-index mask
    (Stepper._combine_row), kblock=1 the host combine_dump weights (which
    once zeroed the last PADDING row instead of the MFT, averaging the
    MFT + its copies into every combined field)."""
    monkeypatch.setenv("MSM_INTERVAL_BLOCK", kblock)
    _run_online_vs_offline(
        tmp_path,
        {"size": 12, "sampling": {"seeds": "1 to 2", "scheme": "Wigner"}},
        mesh="auto",
        check_qx=False,
    )


def test_online_mesh_matches_offline(tmp_path, monkeypatch):
    """Mesh-sharded `--online-synthesis` rides the blocked in-payload path
    (MeshStepper.evolve_intervals combine row: global-index stream mask,
    psum over the stream axis, space-gathered mean fields, Qx psummed over
    the space axes) and must reproduce the offline combiner's files. 3
    streams + MFT over 8 virtual devices -> a (stream=4, x=2) mesh: both
    the stream axis AND the grid are sharded; output_potential rides the
    same payload."""
    monkeypatch.setenv("MSM_INTERVAL_BLOCK", "2")
    _run_online_vs_offline(
        tmp_path,
        {
            "num_data_dumps": 4,
            "output_potential": True,
            "sampling": {"seeds": "1 to 3", "scheme": "Wigner"},
        },
        mesh="auto",
    )


def test_scalar_and_post_array_registry(tmp_path, rng):
    """Registry generality: per-stream SCALAR reductions (averaged over
    streams, written (1,1,1,1) per dump — lib.rs:242-331, the commented-out
    Qk extension point) and post-combine ARRAY functions (main.rs:133-146,
    todo!() in the reference — implemented here)."""
    size, n_streams, dumps = 8, 4, 1
    root = str(tmp_path)
    base = os.path.join(root, "reg")
    fields = _make_stream_dumps(root, "reg", n_streams, dumps, size, rng)

    fns = synthesis.SynthesisFunctions()
    # Qk-style per-stream scalar: sum of psi over the grid
    fns.scalar_functions["Qk"] = lambda psi, psik: jnp.sum(psi)
    # post-combine array: the pointwise ensemble variance field
    fns.post_array_functions["varx"] = (
        lambda psi, psi2, psik, psik2: psi2 - psi * np.conj(psi)
    )
    fns.post_scalar_functions["Qx"] = synthesis.qx_post_scalar(dv=1.0)

    synthesis.analyze_sims(
        fns, base, range(dumps + 1), dims=2, dtype=jnp.complex128, stream_chunk=3
    )
    out_series = synthesis.post_combine(fns, base, range(dumps + 1))

    out = base + "-combined"
    for dump in range(dumps + 1):
        streams = [fields[(s, dump)] for s in range(1, n_streams + 1)]
        # scalar round trip: mean over streams of sum(psi)
        expected_qk = np.mean([np.sum(s) for s in streams])
        got_qk = load_complex_pair(os.path.join(out, f"Qk_{dump:05d}"))
        assert got_qk.shape == (1, 1, 1, 1)
        np.testing.assert_allclose(got_qk.ravel()[0], expected_qk, atol=1e-12)
        # post-array round trip: <|psi|^2> - |<psi>|^2 field
        mean_psi = np.mean(streams, axis=0)
        mean_psi2 = np.mean([np.abs(s) ** 2 for s in streams], axis=0)
        expected_var = mean_psi2 - np.abs(mean_psi) ** 2
        got_var = load_complex_pair(os.path.join(out, f"varx_{dump:05d}")).reshape(
            size, size
        )
        np.testing.assert_allclose(got_var.real, expected_var, atol=1e-12)
        # Qx series consistent with the var field (dv = 1)
        np.testing.assert_allclose(
            out_series["Qx"][dump].ravel()[0], expected_var.sum(), atol=1e-12
        )
