"""Cross-host SPATIAL sharding: two jax.distributed processes where the
GRID (not the stream axis) spans processes — mesh="space" forces the
(stream=1, x, y) pencil over all 8 devices, so every FFT's all_to_all and
every dump gather crosses the process boundary. The union of dumps must
match a single-process run exactly.

This is VERDICT round-2 item 3's 'done' bar (the round-1 engine raised
"whole streams per process" here)."""

import os
import subprocess
import sys

import numpy as np
import pytest

# 2-process rendezvous with hard deadlines: slow AND contention-fragile
# (280 s worker timeout, CLAUDE.md) - keep out of the fast lane
pytestmark = pytest.mark.slow

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, sys
proc_id = int(sys.argv[1]); root = sys.argv[2]; port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=proc_id
)
assert len(jax.devices()) == 8

import jax.numpy as jnp
from msm_tpu import config as cfg, simulator

toml = cfg.parse_toml_str(open(sys.argv[4]).read())
simulator.run_config(toml, dtype=jnp.complex128, data_root=root, mesh="space")
print(f"proc {proc_id} done", flush=True)
"""

TOML = """
axis_length = 30
final_sim_time = 1.0
cfl = 0.5
num_data_dumps = 3
total_mass = 1e8
ntot = 1e6
hbar_ = 0.05
sim_name = "mhs"
k2_cutoff = 0.95
alias_threshold = 0.5
dims = 3
size = 16

[ics]
type = "SphericalTophat"
radius = 5.0
slope = 50
delta = 10

[sampling]
seeds = "[3]"
scheme = "Wigner"
"""


def test_grid_spans_processes(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    toml_path = tmp_path / "mhs.toml"
    toml_path.write_text(TOML)
    root_mh = str(tmp_path / "mh")
    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), root_mh, str(port), str(toml_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out.decode())
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i][-3000:]}"

    # single-process reference with the same forced spatial mesh layout
    # equivalence: plain single-device run
    import jax.numpy as jnp

    from msm_tpu import config as cfg
    from msm_tpu import simulator
    from msm_tpu.io.npy import load_complex_pair

    root_ref = str(tmp_path / "ref")
    toml = cfg.parse_toml_str(TOML)
    simulator.run_config(toml, dtype=jnp.complex128, data_root=root_ref)

    for name in ("mhs", "mhs-stream00003"):
        for dump in range(4):
            a = load_complex_pair(os.path.join(root_mh, name, f"psi_{dump:05d}"))
            b = load_complex_pair(os.path.join(root_ref, name, f"psi_{dump:05d}"))
            np.testing.assert_allclose(a, b, atol=1e-11, err_msg=f"{name} {dump}")
