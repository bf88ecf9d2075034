"""On-chip radix-8 (1024-point axis) validation of the MXU engine.

The R=8 butterfly lanes are suite-covered in interpret mode
(tests/test_fused_radix.py) and R=4 was validated on chip by the 512^3
production runs; this probe closes the gap on real silicon: bare engine
transforms and a production 2-D 1024^2 KDK step, engine (MSM_FFT=mxu) vs
the XLA FFT path on the SAME chip, c64.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_radix8_chip.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from msm_tpu import config as cfg
from msm_tpu.models import ics
from msm_tpu.ops import fft as fft_ops
from msm_tpu.stepper import Stepper
from msm_tpu.utils.transfer import device_get_complex, device_put_complex


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def fetch(z):
    return device_get_complex(z)


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    S = 1024

    # --- bare transforms at R=8, 2-D (both axes run 1024-point lanes) ---
    x = (rng.standard_normal((S, S)) + 1j * rng.standard_normal((S, S))).astype(
        np.complex64
    )
    xd = device_put_complex(x, jnp.complex64)
    ref = np.fft.fftn(x.astype(np.complex128), norm="ortho")

    for mode in ("mxu", "xla"):
        fft_ops.set_default_mode(mode)
        fwd = jax.jit(lambda a: fft_ops.forward(a, 2))
        inv = jax.jit(lambda a: fft_ops.inverse(a, 2))
        t0 = time.monotonic()
        yk = fwd(xd)
        y = fetch(yk)
        log(f"{mode} forward 1024^2 compiled+ran in {time.monotonic()-t0:.1f}s")
        err = np.max(np.abs(y - ref)) / np.max(np.abs(ref))
        rt = fetch(inv(yk))
        rterr = np.max(np.abs(rt - x))
        log(f"{mode}: fwd max rel err vs numpy f64 = {err:.3e}, roundtrip = {rterr:.3e}")
        assert err < 5e-6, (mode, err)
        assert rterr < 5e-5, (mode, rterr)

    # --- production 2-D 1024^2 KDK steps: engine vs XLA path ------------
    toml = cfg.parse_toml_dict(
        dict(
            axis_length=30.0,
            final_sim_time=1.0,
            cfl=0.5,
            num_data_dumps=2,
            total_mass=1e8,
            sim_name="r8probe",
            k2_cutoff=0.95,
            alias_threshold=0.5,
            dims=2,
            size=S,
            hbar_=0.02,
            ics={"type": "SphericalTophat", "radius": 5.0, "slope": 50, "delta": 10},
        )
    )
    p = list(cfg.iter_stream_parameters(toml))[-1]
    psi0 = np.asarray(ics.build_ics(p)).astype(np.complex64)

    outs = {}
    for mode in ("mxu", "xla"):
        fft_ops.set_default_mode(mode)
        st = Stepper(p, jnp.complex64, dt_mode="optimistic")
        log(
            f"{mode}: use_mxu={st.use_mxu} fuse={getattr(st, 'fuse_phases', None)} "
            f"skew={getattr(st, 'skew', None)}"
        )
        t0 = time.monotonic()
        s = st.init_state(psi0)
        for _ in range(3):
            s = st.step(s)
        psi = fetch(s.psi)
        log(
            f"{mode}: 3 steps in {time.monotonic()-t0:.1f}s (incl compile), "
            f"n_steps={np.asarray(s.n_steps)}, norm_err={np.asarray(s.max_norm_err)}"
        )
        outs[mode] = (psi, np.asarray(s.time), np.asarray(s.phi_max))

    da = np.max(np.abs(outs["mxu"][0] - outs["xla"][0]))
    sc = np.max(np.abs(outs["xla"][0]))
    log(f"engine-vs-xla after 3 steps: max|dpsi| = {da:.3e} (scale {sc:.3e})")
    log(f"time mxu={outs['mxu'][1]} xla={outs['xla'][1]}")
    assert np.allclose(outs["mxu"][1], outs["xla"][1], rtol=1e-5), "dt sequence diverged"
    assert da / sc < 1e-3, da
    log("RADIX8 ON-CHIP OK")


if __name__ == "__main__":
    main()
