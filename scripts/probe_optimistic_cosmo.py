"""On-chip EXPANDING-mode validation of the optimistic dt default at 256^3.

The cosmological counterpart of probe_optimistic_longrun.py (VERDICT r4
#5): the reference's spherical-tophat-cosmo configuration scaled to
production size, run end-to-end through the CLI driver path under the
production optimistic dt mode with --debug-checks. The expanding
integrator is where dt semantics and a(t) interact (double half-kick
with the coupled (a, t) RK4 advance between them,
`/root/reference/simulator/src/simulation_object.rs:669-873`): the
optimistic validation compares dtau * 2 * a * max|phi| against the CFL
bound with the scale factor the proposal used, so a growing a(t)
tightens the bound between proposal and validation. Reports per-dump
telemetry (steps, dtau range, replays), the a(t)/tau bookkeeping from
the manifest, the in-jit unitarity monitor, and the supercomoving norm
of the final dump.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_optimistic_cosmo.py
"""

import json
import os
import time

import numpy as np

import jax.numpy as jnp

from msm_tpu import config as cfg
from msm_tpu import simulator


def main():
    import sys

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    toml = cfg.parse_toml_dict(
        dict(
            axis_length=30.0,
            final_sim_time=40.0,
            cfl=0.5,
            num_data_dumps=4,
            total_mass=1e11,  # potential-bound dt (CLAUDE.md)
            sim_name="optcosmo",
            k2_cutoff=0.95,
            alias_threshold=0.5,
            dims=3,
            size=size,
            hbar_=0.05,
            ics={"type": "SphericalTophat", "radius": 5.0, "slope": 50, "delta": 100},
            # reference spherical-tophat-cosmo.toml cosmology table
            cosmology={
                "omega_matter_now": 0.7,
                "omega_radiation_now": 0.0,
                "h": 0.7,
                "z0": 1.0,
                "max_dloga": 0.01,
            },
        )
    )
    params = cfg.resolve_parameters(toml)
    assert params.expanding
    root = "/tmp/optcosmo"
    t0 = time.perf_counter()
    simulator.run_config(
        toml,
        dtype=jnp.complex64,
        data_root=root,
        verbose=True,
        dt_mode="optimistic",
        debug_checks=True,
    )
    print(f"total: {time.perf_counter() - t0:.1f}s", flush=True)
    man = json.load(open(os.path.join(root, "optcosmo", "manifest.json")))
    print(
        "manifest:",
        {
            k: man[k]
            for k in (
                "n_steps", "replays", "current_dumps", "max_norm_err",
                "time", "tau", "a",
            )
            if k in man
        },
        flush=True,
    )
    a0 = 1.0 / (1.0 + toml.cosmology.z0)
    assert man["a"] > a0, (man["a"], a0)  # the universe expanded
    assert man["tau"] > 0.0
    re = np.load(os.path.join(root, "optcosmo", "psi_00004_real"))
    im = np.load(os.path.join(root, "optcosmo", "psi_00004_imag"))
    psi = re + 1j * im
    # supercomoving boxsize (config.py resolves it when [cosmology] is
    # present); norm uses the supercomoving dx
    dx = params.dx
    norm = float((np.abs(psi) ** 2).sum() * dx**toml.dims)
    print(
        f"final dump shape {psi.shape} finite {np.isfinite(psi).all()} "
        f"supercomoving norm {norm:.8f}",
        flush=True,
    )
    replay_rate = man.get("replays", 0) / max(man.get("n_steps", 1), 1)
    print(
        f"replay rate {replay_rate:.4f} over {man.get('n_steps')} steps; "
        f"a: {a0:.4f} -> {man['a']:.4f}, tau {man['tau']:.4f}, "
        f"unitarity monitor max_norm_err {man.get('max_norm_err'):.3e}",
        flush=True,
    )


if __name__ == "__main__":
    main()
