"""On-chip long-run validation of the optimistic dt mode at 256^3.

A potential-bound tophat collapse (total_mass 1e11 makes dt
potential-bound at ~580 steps/interval): thousands of optimistic steps
through collapse/virialization on the production CLI path with
--debug-checks. Reports per-dump telemetry (steps, dt range, replays)
and the in-jit unitarity monitor.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_optimistic_longrun.py
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
    dumps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    toml = cfg.parse_toml_dict(
        dict(
            axis_length=30.0,
            final_sim_time=40.0,
            cfl=0.5,
            num_data_dumps=dumps,
            total_mass=1e11,
            sim_name="optlong",
            k2_cutoff=0.95,
            alias_threshold=0.5,
            dims=3,
            size=size,
            hbar_=0.05,
            ics={"type": "SphericalTophat", "radius": 5.0, "slope": 50, "delta": 100},
        )
    )
    root = "/tmp/optlong"
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
    man = json.load(open(os.path.join(root, "optlong", "manifest.json")))
    print("manifest:", {k: man[k] for k in (
        "n_steps", "replays", "current_dumps", "max_norm_err") if k in man},
        flush=True)
    # dump files carry no .npy extension (reference naming convention)
    arr = np.load(os.path.join(root, "optlong", f"psi_{dumps:05d}_real"))
    print("final dump shape", arr.shape, "finite:", np.isfinite(arr).all(), flush=True)
    replay_rate = man.get("replays", 0) / max(man.get("n_steps", 1), 1)
    print(f"replay rate {replay_rate:.4f} over {man.get('n_steps')} steps", flush=True)


if __name__ == "__main__":
    main()
