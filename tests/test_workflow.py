"""Capstone workflow test: the reference's complete plane-wave pipeline
(`sim.py` -> simulator -> synthesizer -> check_var/plots) through msm_tpu's
tools, end to end on the CPU backend."""

import os

import jax.numpy as jnp
import numpy as np

from msm_tpu import config as cfg
from msm_tpu import simulator, synthesis
from msm_tpu.io.npy import load_complex_pair
from msm_tpu.tools import analyze, check_var, zeldovich


def test_planewave_pipeline(tmp_path):
    work = str(tmp_path)

    # 1. generate Zel'dovich ICs + stream/MFT tomls (sim.py:199-212)
    zcfg = zeldovich.PlaneWaveConfig(
        sim_name="pw",
        size=16,
        n_streams=4,
        ntot=1e8,  # modest n so Wigner noise is visible
        num_data_dumps=4,
        final_sim_time=500.0,
    )
    paths = zeldovich.generate(zcfg, work)

    # 2. run the sampled config (streams + MFT batched) and the MFT toml
    toml = cfg.read_toml(paths["toml"])
    root = os.path.join(work, "sim-data")
    simulator.run_config(toml, dtype=jnp.complex128, data_root=root)

    # every stream + MFT dumped the full schedule
    for d in ["pw"] + [f"pw-stream{s:05d}" for s in range(1, 5)]:
        for i in range(5):
            psi = load_complex_pair(os.path.join(root, d, f"psi_{i:05d}"))
            assert psi.shape == (16, 16, 16, 1)
            assert np.isfinite(psi).all()

    # 3. synthesize (msm-synthesizer)
    result = synthesis.synthesize_toml(toml, data_root=root, dtype=jnp.complex128)
    qx = result["Qx"][:, 0, 0, 0]
    assert qx.shape == (5,)
    assert np.all(qx.real >= -1e-12)  # variance measure
    assert qx.real[1:].max() > 0  # Wigner noise registered

    # 4. ensemble statistics vs MFT (check_var.py)
    stats = check_var.check_toml(toml, data_root=root, dump=0)
    # Wigner count excess: mean ~ 1/2 quantum per mode-cell... just require
    # finite, positive variance consistent with sampling being active
    assert np.isfinite(stats["mean"]) and stats["var"] > 0

    # 5. quantum-statistics bundle (deprecated-python pedigree)
    q = analyze.analyze_dump(toml, data_root=root, dump=4, n_modes=16)
    assert 0.0 < q["coherent_fraction"] <= 1.0 + 1e-9
    assert q["purity"] <= 1.0 + 1e-9
    assert q["von_neumann_entropy"] >= -1e-9

    # 6. plots render from the produced data
    import matplotlib

    matplotlib.use("Agg")
    from msm_tpu.tools import plotting

    fig = plotting.density_frame(os.path.join(root, "pw"), 4)
    assert fig is not None
    fig2 = plotting.plot_q_series(os.path.join(root, "pw-combined"))
    assert fig2 is not None
