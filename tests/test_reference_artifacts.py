"""Parity anchors on the reference's SHIPPED data artifacts.

The reference ships two real psi fields its UserSpecified loader
(`simulator/src/ics.rs:650-730`, `sim.py:124-186`) was built around:

- `/root/reference/initial_conditions/planeWave3d_e10_sym.npz` (16^3), the
  IC of `tomls/planeWave3d_e10_sym.toml` (one of BASELINE.json's named
  configs): a Zel'dovich plane-wave collapse in an expanding (EdS) box.
- `/root/reference/planeWave1d.npz` (256^1), a 1-D plane-wave field.

These tests ingest both unchanged, assert byte-parity of the dump-0 layout
with the shipped arrays (the loader must not renormalize or transpose:
the reference ingests as-is, `ics.rs:716-729`), and check physical sanity
of the evolution. The evolved MFT dump is frozen as a golden file.
"""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

from msm_tpu import config as cfg
from msm_tpu import simulator
from msm_tpu.io.npy import load_complex_pair

REF = "/root/reference"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)


def _plane3d_toml(dumps=2, seeds="[1, 2]"):
    toml = cfg.read_toml(os.path.join(REF, "tomls", "planeWave3d_e10_sym.toml"))
    return dataclasses.replace(
        toml,
        num_data_dumps=dumps,
        ics=cfg.UserSpecified(
            path=os.path.join(REF, "initial_conditions", "planeWave3d_e10_sym.npz")
        ),
        sampling=dataclasses.replace(toml.sampling, seeds=cfg.parse_seeds(seeds)),
        remote_storage_parameters=None,
    )


def test_plane3d_toml_parses_as_shipped():
    """The shipped toml (incl. its unused num_streams key and
    remote-storage table) parses unchanged."""
    toml = cfg.read_toml(os.path.join(REF, "tomls", "planeWave3d_e10_sym.toml"))
    assert toml.size == 16 and toml.dims == 3
    assert toml.sampling.scheme == "Wigner"
    assert toml.sampling.seeds == tuple(range(1, 17))
    assert toml.cosmology is not None and toml.cosmology.z0 == 99.0
    assert toml.remote_storage_parameters.storage_account == "streams"


def test_plane3d_dump0_byte_parity_with_shipped_ic(tmp_path):
    """dump 0 of the MFT run must equal the shipped npz exactly: same
    values, same axis order, 4-D dump shape — the ingestion path applies
    no normalization or transpose (ics.rs:650-730, io.rs:34-97)."""
    toml = _plane3d_toml()
    root = str(tmp_path)
    # dt_mode pinned: the golden freeze below anchors the EXACT-dt
    # trajectory (parity semantics); the production default (optimistic)
    # is trajectory-equivalence-tested in test_stepper/test_simulator
    simulator.run_config(
        toml, dtype=jnp.complex128, data_root=root, dt_mode="exact"
    )

    with np.load(toml.ics.path) as npz:
        ref = (npz["real"] + 1j * npz["imag"]).reshape(16, 16, 16, 1)
    got = load_complex_pair(os.path.join(root, toml.sim_name, "psi_00000"))
    assert got.shape == (16, 16, 16, 1)
    assert got.dtype == np.complex128
    np.testing.assert_array_equal(got, ref)

    # physical sanity of the expanding collapse: norm conserved, scale
    # factor grown, density contrast sharpened (Zel'dovich collapse).
    import json

    last = load_complex_pair(
        os.path.join(root, toml.sim_name, f"psi_{toml.num_data_dumps:05d}")
    )
    n0 = float(np.sum(np.abs(ref) ** 2))
    n1 = float(np.sum(np.abs(last) ** 2))
    assert n1 == pytest.approx(n0, rel=1e-8)
    man = json.load(open(os.path.join(root, toml.sim_name, "manifest.json")))
    assert man["a"] > 1.0 / 100.0
    assert man["tau"] > 0.0
    assert np.max(np.abs(last) ** 2) > np.max(np.abs(ref) ** 2)

    # streams sampled around the MFT differ from it but stay the same
    # order of magnitude (the shipped IC's normalization quirk — getPsi
    # divides by sqrt(sum|psi|^2 * dx), one power of dx, sim.py:170-183 —
    # leaves ~1 particle per cell, so Wigner noise is O(1) relative)
    s1 = load_complex_pair(
        os.path.join(root, f"{toml.sim_name}-stream00001", "psi_00000")
    )
    assert np.abs(s1 - ref).max() > 0
    assert float(np.sum(np.abs(s1) ** 2)) == pytest.approx(n0, rel=0.5)

    # golden freeze of the evolved MFT dump (anchored to the shipped IC)
    golden_path = os.path.join(GOLDEN_DIR, "planewave3d_mft_psi_00002.npy")
    if not os.path.exists(golden_path):  # pragma: no cover - first generation
        np.save(golden_path, last)
    golden = np.load(golden_path)
    np.testing.assert_allclose(last, golden, rtol=0, atol=1e-10)


def test_plane1d_ingest_and_evolve(tmp_path):
    """planeWave1d.npz (256^1, normalized for L=60): ingest unchanged,
    dump-0 byte parity, unitary static evolution."""
    # total_mass is softened vs the 3-D config's 3e16: the plane-symmetric
    # 1-D collapse at that mass runs ~170 dynamical times in 1 Myr and
    # cascades past the alias cutoff before the first dump; the npz pins
    # only the field, and this test anchors INGESTION, not a specific run.
    toml = cfg.parse_toml_dict(
        {
            "axis_length": 60.0,
            "final_sim_time": 1.0,
            "cfl": 0.1,
            "num_data_dumps": 2,
            "total_mass": 1e11,
            "ntot": 1e10,
            "hbar_": 0.01,
            "sim_name": "planeWave1d",
            "k2_cutoff": 0.95,
            "alias_threshold": 0.01,
            "dims": 1,
            "size": 256,
            "ics": {
                "type": "UserSpecified",
                "path": os.path.join(REF, "planeWave1d.npz"),
            },
        }
    )
    root = str(tmp_path)
    simulator.run_config(toml, dtype=jnp.complex128, data_root=root)

    with np.load(toml.ics.path) as npz:
        ref = (npz["real"] + 1j * npz["imag"]).reshape(256, 1, 1, 1)
    got = load_complex_pair(os.path.join(root, "planeWave1d", "psi_00000"))
    assert got.shape == (256, 1, 1, 1)
    np.testing.assert_array_equal(got, ref)

    dx = 60.0 / 256
    assert float(np.sum(np.abs(ref) ** 2) * dx) == pytest.approx(1.0, abs=1e-10)
    last = load_complex_pair(os.path.join(root, "planeWave1d", "psi_00002"))
    assert float(np.sum(np.abs(last) ** 2) * dx) == pytest.approx(1.0, abs=1e-8)
    assert np.abs(last - ref).max() > 1e-6  # it actually evolved
