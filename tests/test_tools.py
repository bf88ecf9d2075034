"""Tooling tests: Zel'dovich IC generator, plotting smoke, check_var."""

import os

import numpy as np
import pytest

from msm_tpu import config as cfg
from msm_tpu.tools import zeldovich


def test_zeldovich_psi_properties():
    zcfg = zeldovich.PlaneWaveConfig(size=16)
    psi = zeldovich.zeldovich_psi(zcfg)
    assert psi.shape == (16, 16, 16)
    # normalized to unit mass with dx = L/N along ONE axis (the reference's
    # convention, sim.py:179: Mtot = sum |psi|^2 * dx)
    dx = zcfg.axis_length / zcfg.size
    assert np.sum(np.abs(psi) ** 2) * dx == pytest.approx(1.0, rel=1e-10)
    assert np.all(np.isfinite(psi))
    # density is symmetric under axis permutation for equal amplitudes
    dens = np.abs(psi) ** 2
    np.testing.assert_allclose(dens, dens.transpose(1, 0, 2), atol=1e-12)


def test_zeldovich_generate_and_ingest(tmp_path):
    zcfg = zeldovich.PlaneWaveConfig(sim_name="pw-test", size=16, n_streams=2)
    paths = zeldovich.generate(zcfg, str(tmp_path))
    assert os.path.exists(paths["npz"])

    toml = cfg.read_toml(paths["toml"])
    assert toml.sim_name == "pw-test"
    assert toml.sampling.seeds == (1, 2)
    assert toml.cosmology is not None
    mft = cfg.read_toml(paths["mft_toml"])
    assert mft.sampling is None
    assert mft.sim_name == "pw-test-mft"

    # the generated npz must load through the UserSpecified IC path
    from msm_tpu.models.ics import build_ics

    p = cfg.resolve_parameters(toml)
    psi = build_ics(p)
    assert psi.shape == (16, 16, 16)


def test_plotting_smoke(tmp_path, rng):
    import matplotlib

    matplotlib.use("Agg")
    from msm_tpu.io.npy import write_complex_pair
    from msm_tpu.tools import plotting

    sim_dir = tmp_path / "plotsim"
    os.makedirs(sim_dir)
    for dump in range(3):
        psi = rng.standard_normal((8, 8, 8, 1)) + 1j * rng.standard_normal((8, 8, 8, 1))
        write_complex_pair(str(sim_dir / f"psi_{dump:05d}"), psi)

    assert plotting.count_dumps(str(sim_dir)) == 3
    fig = plotting.density_frame(str(sim_dir), 1)
    assert fig is not None
    frames = plotting.density_movie_frames(str(sim_dir), str(tmp_path / "frames"))
    assert len(frames) == 3
    assert all(os.path.exists(f) for f in frames)

    r, m = plotting.radial_profile(np.abs(rng.standard_normal((8, 8, 8))), 30.0)
    assert r.shape == m.shape

    fig = plotting.density_panels(str(sim_dir), 0, axis_length=30.0, hbar_=0.05)
    assert fig is not None


def test_check_var_statistics(tmp_path):
    """Run a small Poisson ensemble; the count excess must have mean/var
    consistent with shot noise (the check_var.py validation)."""
    import jax.numpy as jnp

    from msm_tpu import simulator, synthesis
    from msm_tpu.tools import check_var

    toml = cfg.parse_toml_dict(
        {
            "axis_length": 16.0,
            "final_sim_time": 0.01,
            "cfl": 0.5,
            "num_data_dumps": 1,
            "total_mass": 1e8,
            "ntot": 1e5,
            "hbar_": 0.05,
            "sim_name": "cv",
            "k2_cutoff": 0.95,
            "alias_threshold": 1e9,
            "dims": 2,
            "size": 16,
            "ics": {"type": "ColdGauss", "mean": [8.0, 8.0], "std": [3.0, 3.0]},
            "sampling": {"seeds": "1 to 32", "scheme": "Poisson"},
        }
    )
    root = str(tmp_path / "sim-data")
    simulator.run_config(toml, dtype=jnp.complex128, data_root=root)
    synthesis.synthesize_toml(toml, data_root=root, dtype=jnp.complex128)
    stats = check_var.check_toml(toml, data_root=root, dump=0)
    # Poisson: E[count'] = count => excess mean ~ 0; var over cells is the
    # per-cell lambda averaged (bounded by max cell occupancy / n_streams)
    assert abs(stats["mean"]) < 50.0
    assert stats["var"] > 0.0


def test_job_generator(tmp_path):
    from msm_tpu.tools import jobs

    scripts = jobs.generate_jobs(
        "config.toml", num_dumps=5, out_dir=str(tmp_path / "sb"), dumps_per_job=2
    )
    # ceil(6/2) = 3 range jobs + 1 post job
    assert len(scripts) == 4
    body = open(scripts[0]).read()
    assert "--dump-range 0:1" in body
    assert "#SBATCH --cpus-per-task=4" in body
    assert "--post-only" in open(scripts[-1]).read()


def test_dump_range_synthesis(tmp_path, rng):
    """Ranged combines + a post-only pass reproduce the single-shot result."""
    import jax.numpy as jnp

    from msm_tpu import synthesis
    from msm_tpu.io.npy import load_complex_pair, write_complex_pair

    size, n_streams, dumps = 8, 3, 3
    root = str(tmp_path)
    name = "ranged"
    for s in range(1, n_streams + 1):
        d = os.path.join(root, f"{name}-stream{s:05d}")
        os.makedirs(d)
        for dump in range(dumps + 1):
            psi = rng.standard_normal((size, size)) + 1j * rng.standard_normal(
                (size, size)
            )
            write_complex_pair(
                os.path.join(d, f"psi_{dump:05d}"), psi.reshape(size, size, 1, 1)
            )

    toml = cfg.parse_toml_dict(
        {
            "axis_length": 16.0,
            "final_sim_time": 1.0,
            "cfl": 0.5,
            "num_data_dumps": dumps,
            "total_mass": 1e8,
            "hbar_": 0.05,
            "sim_name": name,
            "k2_cutoff": 0.95,
            "alias_threshold": 0.5,
            "dims": 2,
            "size": size,
            "ics": {"type": "SphericalTophat", "radius": 5.0, "slope": 50, "delta": 10},
        }
    )
    # two ranged passes then post-only
    assert synthesis.synthesize_toml(
        toml, data_root=root, dtype=jnp.complex128, dump_range=(0, 1)
    ) == {}
    assert synthesis.synthesize_toml(
        toml, data_root=root, dtype=jnp.complex128, dump_range=(2, 3)
    ) == {}
    result = synthesis.synthesize_post_only(toml, data_root=root)
    assert result["Qx"].shape == (dumps + 1, 1, 1, 1)
    series = load_complex_pair(os.path.join(root, f"{name}-combined", "Qx"))
    np.testing.assert_allclose(series, result["Qx"])


def test_density_movie_gif(tmp_path, rng):
    from msm_tpu.io.npy import write_complex_pair
    from msm_tpu.tools import plotting

    sim_dir = tmp_path / "movsim"
    os.makedirs(sim_dir)
    for dump in range(3):
        psi = rng.standard_normal((8, 8, 1, 1)) + 1j * rng.standard_normal((8, 8, 1, 1))
        write_complex_pair(str(sim_dir / f"psi_{dump:05d}"), psi)
    out = plotting.density_movie(str(sim_dir), str(tmp_path / "mov.gif"))
    assert os.path.exists(out)
    assert os.path.getsize(out) > 1000
