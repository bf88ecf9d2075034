"""Benchmark helpers (shared by /bench.py and `python -m msm_tpu bench`).

North-star metrics (BASELINE.md): grid-updates/s/chip for the KDK step and
streams/s for the ensemble; `vs_baseline` is the fraction of the analytic
HBM roofline since the reference publishes no numbers.
"""

from __future__ import annotations

import json
import sys
import time


def _log(msg: str) -> None:
    """Progress/heartbeat lines go to STDERR so stdout stays a clean
    stream of JSON records for the driver to parse."""
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _emit(record: dict) -> None:
    """Print one COMPLETE JSON record per line, flushed immediately.

    The bench contract (VERDICT r4 #1): a valid, driver-parseable JSON
    line must exist on stdout as soon as the FIRST measurement finishes.
    Later, richer records re-print the merged result as the new last
    line; a timeout anywhere after the first _emit degrades the artifact
    to the most recent complete record — never to silence (BENCH_r04 was
    rc=124 with nothing captured because the old main printed once, at
    the very end of three multi-minute measurements)."""
    print(json.dumps(record), flush=True)


def wait_for_backend(timeout_s: float = 600.0) -> float:
    """Block until the accelerator backend answers a trivial program,
    with a heartbeat so a stall is visible, not silent.

    Handles the documented chip-grant stall (CLAUDE.md: a killed
    predecessor process holds the TPU grant ~5 min and the next run
    stalls silently inside the first dispatch). Runs a tiny jitted
    reduction + value fetch (on the tunneled backend only a value
    transfer truly syncs) in a worker thread and prints a heartbeat
    every 15 s while waiting. Returns the wait time in seconds; raises
    after `timeout_s` so the failure is loud instead of eating the
    whole driver window."""
    import threading

    t0 = time.monotonic()
    done = threading.Event()
    err: list[BaseException] = []

    def probe():
        try:
            import jax
            import jax.numpy as jnp
            import numpy as np

            dev = jax.devices()[0]
            _log(f"backend probe: {dev.platform}/{dev.device_kind}")
            val = float(np.asarray(jax.jit(lambda x: x.sum())(jnp.arange(8.0))))
            assert val == 28.0
        except BaseException as e:  # noqa: BLE001 - re-raised on the main thread
            err.append(e)
        finally:
            done.set()

    threading.Thread(target=probe, daemon=True).start()
    while not done.wait(15.0):
        waited = time.monotonic() - t0
        if waited > timeout_s:
            raise TimeoutError(
                f"backend still unresponsive after {waited:.0f}s "
                "(chip grant held by a dead process?)"
            )
        _log(f"waiting for backend... {waited:.0f}s (grant stall clears in ~5 min)")
    if err:
        raise err[0]
    waited = time.monotonic() - t0
    _log(f"backend ready in {waited:.1f}s")
    return waited


_HBM_GBPS = {
    # device_kind substring -> HBM GB/s (public chip specs)
    "v5 lite": 819.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v6 lite": 1640.0,
    "v6e": 1640.0,
    "v4": 1228.0,
}


def _hbm_gbps() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, bw in _HBM_GBPS.items():
        if key in kind:
            return bw
    return 819.0


def estimate_sol_updates_per_s(bytes_per_cell: int = 8) -> float:
    """Round-1 cross-round reference model: cell-updates/s for one KDK
    step under the analytic XLA pass accounting (44 passes x 8 B/cell).
    Kept FIXED so vs_baseline stays comparable across rounds — the fused
    step beats it (it moves ~4x fewer bytes), so vs_baseline can read
    >1.0. `fused_dma_bound_updates_per_s` is the honest per-mode bound.

    Step = 5 complex transforms (2 kinetic round trips + 1 re-forward) plus
    the half-spectrum Poisson pair (~1 complex equivalent) at ~3 axis
    passes x read+write each, plus ~8 fused elementwise passes.
    """
    passes = 6 * 3 * 2 + 8
    return _hbm_gbps() * 1e9 / (passes * bytes_per_cell)


def step_bytes_per_cell(dt_mode: str, fused_skew: bool) -> float:
    """HBM bytes moved per cell per step — the step's OWN DMA model, used
    for the honest `vs_dma_bound` roofline fraction (BASELINE.md round-4
    "honest second roofline").

    Fused skewed step (production): ~124 B/cell measured accounting for
    the 4-pass lagged/optimistic interior (BASELINE.md). The exact-dt
    prefix adds 4 read-heavy passes (planar roundtrip rw 16 B, inverse+
    density 12 B, rho roundtrip 8 B, max-reduce read 4 B) ~= +40 B/cell.
    Note the exact mode is NOT purely DMA-bound: at HIGHEST psi-matmul
    precision a large share of its extra time is MXU-bound (the 6-pass
    bf16 matmul decomposition), which is why its measured vs_dma_bound
    sits below the lagged mode's. Non-fused paths fall back to the
    44-pass x 8 B analytic model."""
    if not fused_skew:
        return 44.0 * 8.0
    return 164.0 if dt_mode == "exact" else 124.0


def fused_dma_bound_updates_per_s(dt_mode: str, fused_skew: bool) -> float:
    return _hbm_gbps() * 1e9 / step_bytes_per_cell(dt_mode, fused_skew)


def run_kdk_bench(
    size: int, dims: int, streams: int, steps: int, dt_mode: str = "lagged"
) -> dict:
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from .cache import enable_compilation_cache

    enable_compilation_cache()

    from .. import config as cfg
    from ..models.ics import build_ics
    from ..ops import fft as fft_ops
    from ..stepper import Stepper

    # Headline = the production fast path: MSM_FFT=auto (the Pallas MXU
    # CT-matmul transforms with fused step phases on TPU) + lagged dt
    # (--fast-dt: one Poisson solve per step, closing half-kick deferred).
    # Both resolve to the plain XLA/exact path off-TPU or via env/flag.
    if os.environ.get("MSM_FFT") is None:
        fft_ops.set_default_mode("auto")

    toml = cfg.TomlParameters(
        axis_length=30.0,
        final_sim_time=1e9,  # never dump-limited during the bench
        cfl=0.5,
        num_data_dumps=1,
        total_mass=1e11,
        sim_name="bench",
        k2_cutoff=0.95,
        alias_threshold=1e9,  # alias check runs but never trips
        dims=dims,
        size=size,
        ics=cfg.SphericalTophat(radius=5.0, delta=100.0, slope=50.0),
        hbar_=0.05,
    )
    params = cfg.resolve_parameters(toml)
    stepper = Stepper(params, jnp.complex64, dt_mode=dt_mode)

    psi0 = build_ics(params)
    if streams > 1:
        psi0 = np.broadcast_to(psi0[None], (streams,) + psi0.shape)
    state = stepper.init_state(psi0, batched=streams > 1)

    # Sync via a jitted reduction + scalar fetch: on the tunneled TPU
    # backend block_until_ready does not reliably wait for remote
    # execution — only a value transfer does.
    redsum = jax.jit(lambda a: jnp.real(a).sum())

    def sync(s):
        # psik is freshly written every step (psi is lazy in lagged mode)
        return float(np.asarray(redsum(s.psik)))

    # The whole step chain runs inside ONE program (fori_loop), exactly
    # like the production per-dump-interval while_loop. Dispatching steps
    # as separate calls measured the RELAY, not the chip: each call costs
    # 20-400 ms of blocking host time on the tunneled backend (and repeat
    # calls with identical inputs appear to be served from a result
    # cache). Timing = slope between two trip counts of the same compiled
    # chain, which cancels the dispatch + fetch floor; every call feeds
    # the previous output forward so no two calls are identical.
    chain = jax.jit(stepper._chain_n_steps)

    n_lo = max(2, steps // 10)
    state = chain(state, stepper.consts, n_lo)  # compile + warm
    sync(state)

    def timed(s, n):
        t0 = time.perf_counter()
        s = chain(s, stepper.consts, n)
        sync(s)
        return time.perf_counter() - t0, s

    best = float("inf")
    for _ in range(2):
        t_lo, state = timed(state, n_lo)
        t_hi, state = timed(state, n_lo + steps)
        best = min(best, (t_hi - t_lo) / steps)
    elapsed = best * steps

    cells = streams * size**dims
    updates_per_s = cells * steps / elapsed
    fused_skew = bool(getattr(stepper, "skew", False))
    out = {
        "metric": "grid_updates_per_s_per_chip",
        "value": round(updates_per_s, 1),
        "unit": f"cell-updates/s (size={size}^{dims} x {streams} streams, c64 KDK)",
        "vs_baseline": round(updates_per_s / estimate_sol_updates_per_s(), 4),
        # the step's OWN DMA bound (124 B/cell fused-skew model; honest:
        # never reads >1.0 — vs_baseline is the FIXED round-1 pass model
        # kept for cross-round comparability)
        "vs_dma_bound": round(
            updates_per_s / fused_dma_bound_updates_per_s(dt_mode, fused_skew), 4
        ),
        "steps_per_s": round(steps / elapsed, 3),
        "dt_mode": dt_mode,
        "fft_mode": fft_ops.get_mode(size),
        "fused_phases": bool(getattr(stepper, "fuse_phases", False)),
        "device": jax.devices()[0].device_kind,
    }
    if dt_mode == "optimistic":
        # validation-replay rate over the whole bench run (expected ~0:
        # the potential changes slowly and the carried bound has
        # anti-churn hysteresis; BASELINE.md). A replayed iteration does
        # kernel work but advances no physics, so the headline value is
        # deflated to ACCEPTED-step throughput — the honest number.
        replays = int(np.asarray(state.replays).sum())
        accepted = max(int(np.asarray(state.n_steps).sum()), 1)
        rate = replays / accepted
        out["replay_rate"] = round(rate, 5)
        out["iteration_updates_per_s"] = out["value"]
        out["value"] = round(out["value"] / (1.0 + rate), 1)
        out["vs_baseline"] = round(out["vs_baseline"] / (1.0 + rate), 4)
        out["vs_dma_bound"] = round(out["vs_dma_bound"] / (1.0 + rate), 4)
    return out


def run_ensemble_bench(
    size: int = 16, dims: int = 3, streams: int = 128, dumps: int = 8
) -> dict:
    """streams/s on the reference's headline ensemble shape (128 Wigner
    streams at 16^3, BASELINE.md): full evolve-to-dump chunks, batched."""
    import time as _t

    import jax
    import jax.numpy as jnp
    import numpy as np

    from .. import config as cfg
    from ..models.ics import build_ics
    from ..models.sampling import sample_stream_batch
    from ..stepper import Stepper
    from .cache import enable_compilation_cache

    enable_compilation_cache()
    toml = cfg.TomlParameters(
        axis_length=30.0,
        final_sim_time=float(dumps) * 0.2,
        cfl=0.5,
        num_data_dumps=dumps,
        total_mass=1e11,
        ntot=1e10,
        hbar_=0.05,
        sim_name="bench-ens",
        k2_cutoff=0.95,
        alias_threshold=1e9,
        dims=dims,
        size=size,
        ics=cfg.SphericalTophat(radius=5.0, delta=100.0, slope=50.0),
    )
    params = cfg.resolve_parameters(toml)
    # production default dt semantics (simulator.run_config)
    stepper = Stepper(params, jnp.complex64, dt_mode="optimistic")

    from .transfer import device_put_complex

    psi0 = device_put_complex(build_ics(params), jnp.complex64)

    def make_state(seed0: int):
        seeds = jnp.arange(seed0, seed0 + streams, dtype=jnp.uint32)
        batch = sample_stream_batch(psi0, params, seeds, "Wigner")
        return stepper.init_state(batch, batched=True)

    redsum = jax.jit(lambda a: jnp.real(a).sum())

    # Production path: all dump intervals in ONE dispatch (evolve_intervals
    # scan — the driver's interval blocking). Warm up/compile on one seed
    # batch, time a DIFFERENT batch: the tunneled backend serves repeated
    # (executable, inputs) pairs from a result cache (BASELINE.md).
    warm, _ = stepper.evolve_intervals(make_state(1), dumps)
    float(np.asarray(redsum(warm.psi)))

    state = make_state(1 + streams)
    float(np.asarray(redsum(state.psi)))  # sync init out of the timed region
    t0 = _t.perf_counter()
    state, _ = stepper.evolve_intervals(state, dumps)
    float(np.asarray(redsum(state.psi)))
    elapsed = _t.perf_counter() - t0
    chunks = dumps
    total_steps = int(np.asarray(state.n_steps).sum())
    return {
        "metric": "streams_per_s",
        "value": round(streams * chunks / elapsed, 2),
        "unit": f"stream-dump-intervals/s ({streams} Wigner streams, {size}^{dims})",
        "vs_baseline": round(streams * chunks / elapsed, 2),  # ref runs streams serially
        "ensemble_steps_per_s": round(total_steps / elapsed, 1),
    }


_ICI_GBPS = {
    # device_kind substring -> per-chip ICI bandwidth GB/s (public specs:
    # v5e 1600 Gbps interchip interconnect per chip)
    "v5 lite": 200.0,
    "v5e": 200.0,
    "v5p": 600.0,
    "v6 lite": 448.0,
    "v6e": 448.0,
    "v4": 300.0,
}


def _ici_gbps() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, bw in _ICI_GBPS.items():
        if key in kind:
            return bw
    return 200.0


def modeled_a2a_fraction(n_space: int) -> float:
    """Modeled all_to_all share of a sharded fused step on the TPU target:
    4 exchanges/step moving 8 B x (d-1)/d per cell over ICI vs the 124
    B/cell fused-kernel HBM traffic (BASELINE.md round-4 scaling model;
    no compute/comm overlap assumed — the pessimistic bound)."""
    if n_space <= 1:
        return 0.0
    a2a_bytes = 4 * 8.0 * (n_space - 1) / n_space
    t_comm = a2a_bytes / _ici_gbps()
    t_mem = 124.0 / _hbm_gbps()
    return round(t_comm / (t_comm + t_mem), 3)


def run_scaling_bench(size: int = 64, dims: int = 3, steps: int = 5) -> dict:
    """Weak-scaling sweep: fixed per-device grid load, 1..N devices.

    Each point runs the KDK step over a (stream=1, x, y) pencil mesh with
    the GLOBAL grid scaled so every device holds a (size^dims) pencil;
    efficiency = t(1 device) / t(n devices) at constant per-device work.
    On a real pod slice this produces the BASELINE.md weak-scaling table;
    on the CPU virtual-device mesh it exercises the same collective
    structure (numbers then measure XLA CPU collectives, not ICI).

    Runs single- OR multi-process (bench.py --processes N spawns the
    2-process CPU rehearsal with the same jax.distributed bootstrap as
    tests/test_multihost_spatial.py; on a pod slice the TPU runtime is
    the launcher and this code path is unchanged): points with n >=
    process_count split devices evenly across processes so the
    all_to_alls cross the process boundary (DCN on real hardware); the
    1-device baseline runs process-locally on every process.
    """
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from .. import config as cfg
    from ..models.ics import build_ics
    from ..ops import fft as fft_ops
    from ..parallel.mesh import SPACE2_AXIS, SPACE_AXIS, STREAM_AXIS
    from ..parallel.sharded import MeshStepper
    from .cache import enable_compilation_cache

    enable_compilation_cache()
    # on a real pod slice the production path is the sharded fused engine
    # (MeshStepper picks it whenever the mode resolves to mxu and the grid
    # divides the space devices); match the kdk bench's default
    if os.environ.get("MSM_FFT") is None:
        fft_ops.set_default_mode("auto")
    devices = jax.devices()
    n_proc = jax.process_count()
    by_proc: dict = {}
    for d in devices:
        by_proc.setdefault(d.process_index, []).append(d)
    local = by_proc.get(jax.process_index(), devices)

    def pick_devices(n: int):
        if n_proc == 1:
            return devices[:n]
        if n < n_proc:
            # process-local baseline: every process times its own copy
            return local[:n]
        per = n // n_proc
        return [d for pi in sorted(by_proc) for d in by_proc[pi][:per]]

    # Device counts to visit: the 1-device baseline, then powers of two
    # (single process) or every multiple of the process count (multi
    # process — a power-of-two walk would skip ALL multi-device points
    # when n_proc is not a power of two and silently report a baseline-
    # only table with efficiency 1.0).
    if n_proc == 1:
        counts, n = [1], 2
        while n <= len(devices):
            counts.append(n)
            n *= 2
    else:
        counts = [1] + [
            k * n_proc for k in range(1, len(devices) // n_proc + 1)
        ]
    points = []
    for n in counts:
        # pencil split: px >= py, px*py = n
        py = int(n**0.5)
        while n % py:
            py -= 1
        px = n // py
        # scale the global grid to keep per-device volume constant
        gsize = size
        while (gsize // px) * (gsize // py) * gsize < size**dims or gsize % max(px, py):
            gsize += size
        toml = cfg.TomlParameters(
            axis_length=30.0,
            final_sim_time=1e9,
            cfl=0.5,
            num_data_dumps=1,
            total_mass=1e11,
            sim_name="bench-scale",
            k2_cutoff=0.95,
            alias_threshold=1e9,
            dims=dims,
            size=gsize,
            ics=cfg.SphericalTophat(radius=5.0, delta=100.0, slope=50.0),
            hbar_=0.05,
        )
        params = cfg.resolve_parameters(toml)
        mesh = Mesh(
            np.asarray(pick_devices(n)).reshape(1, px, py),
            (STREAM_AXIS, SPACE_AXIS, SPACE2_AXIS),
        )
        stepper = MeshStepper(params, mesh, jnp.complex64)
        psi0 = build_ics(params)[None]
        state = stepper.init_state(psi0)
        redsum = jax.jit(lambda a: jnp.real(a).sum())
        state = stepper.step(state)
        float(np.asarray(redsum(state.psi)))  # compile + sync
        t0 = time.perf_counter()
        for _ in range(steps):
            state = stepper.step(state)
        float(np.asarray(redsum(state.psi)))
        dt = (time.perf_counter() - t0) / steps
        points.append(
            {
                "devices": n,
                "mesh": f"(1,{px},{py})",
                "global_grid": gsize,
                "step_ms": round(dt * 1e3, 2),
                "cell_updates_per_s": round(gsize**dims / dt, 1),
            }
        )
    # cubic grids cannot hold per-device volume exactly constant across
    # device counts, so efficiency is per-device THROUGHPUT normalized to
    # the single-device point (load-invariant)
    base = points[0]["cell_updates_per_s"]
    for pt in points:
        pt["weak_scaling_efficiency"] = round(
            (pt["cell_updates_per_s"] / pt["devices"]) / base, 3
        )
        # measured collective share (1 - efficiency at constant per-device
        # load) vs the modeled ICI all_to_all share (BASELINE.md) — on a
        # CPU virtual mesh "measured" reflects XLA CPU collectives
        pt["comm_fraction_measured"] = round(
            max(0.0, 1.0 - pt["weak_scaling_efficiency"]), 3
        )
        pt["comm_fraction_modeled"] = modeled_a2a_fraction(pt["devices"])
    # Label the collective transport so a CPU-rehearsal number can never
    # be quoted as an ICI measurement (VERDICT r4 weak-#4): on the
    # virtual-device CPU mesh comm_fraction_measured reflects XLA's
    # host Gloo loopback collectives, NOT the interchip interconnect the
    # comm_fraction_modeled column models.
    dev0 = jax.devices()[0]
    is_tpu = dev0.platform == "tpu" or "tpu" in dev0.device_kind.lower()
    transport = "ici" if is_tpu else f"{dev0.platform}-gloo"
    return {
        "metric": "weak_scaling",
        "value": points[-1]["weak_scaling_efficiency"],
        "unit": (
            f"per-device throughput at {points[-1]['devices']} devices / "
            "1-device throughput"
        ),
        "vs_baseline": points[-1]["weak_scaling_efficiency"],
        "processes": n_proc,
        "transport": transport,
        "points": points,
    }


def _spawn_scaling_procs(args) -> None:
    """Self-bootstrap the 2-process CPU weak-scaling rehearsal: spawn N
    workers with the same jax.distributed loopback bootstrap the
    multihost tests use; worker 0 inherits stdout and prints the JSON."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    # repo checkout: three dirs up is /bench.py; installed package: fall
    # back to `-m msm_tpu bench` (same flags via the CLI bench subcommand)
    bench = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "bench.py",
    )
    entry = [bench] if os.path.exists(bench) else ["-m", "msm_tpu", "bench"]
    dpp = int(getattr(args, "devices_per_proc", 4) or 4)
    procs = []
    for i in range(args.processes):
        env = dict(os.environ)
        env.update(
            MSM_BENCH_PROC_ID=str(i),
            MSM_BENCH_NPROCS=str(args.processes),
            MSM_BENCH_COORD=f"127.0.0.1:{port}",
            PALLAS_AXON_POOL_IPS="",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=f"--xla_force_host_platform_device_count={dpp}",
        )
        cmd = [
            sys.executable, *entry, "--metric", "scaling",
            "--size", str(args.size), "--steps", str(args.steps),
            "--processes", str(args.processes),
        ]
        procs.append(
            subprocess.Popen(
                cmd,
                env=env,
                stdout=None if i == 0 else subprocess.DEVNULL,
                stderr=None if i == 0 else subprocess.DEVNULL,
            )
        )
    rcs = [p.wait() for p in procs]
    if any(rcs):
        raise RuntimeError(f"scaling workers failed: rc={rcs}")


def resolve_metric_defaults(args) -> None:
    """Per-metric size/steps defaults (bench.py passes None): the scaling
    sweep holds size^dims per DEVICE and scales the GLOBAL grid up to
    match, so it needs a much smaller base than the single-chip kdk grid
    (inheriting kdk's 256 once built >=512^3 global CPU grids)."""
    metric = getattr(args, "metric", "kdk")
    if getattr(args, "size", None) is None:
        args.size = 64 if metric == "scaling" else 256
    if getattr(args, "steps", None) is None:
        args.steps = 5 if metric == "scaling" else 100


def main(args) -> None:
    metric = getattr(args, "metric", "kdk")
    resolve_metric_defaults(args)
    if metric == "streams":
        wait_for_backend()
        _emit(run_ensemble_bench(streams=args.streams or 128))
        return
    if metric == "scaling":
        import os

        n_procs = int(getattr(args, "processes", 1) or 1)
        if n_procs > 1 and os.environ.get("MSM_BENCH_PROC_ID") is None:
            _spawn_scaling_procs(args)
            return
        if os.environ.get("MSM_BENCH_PROC_ID") is not None:
            import jax

            jax.distributed.initialize(
                coordinator_address=os.environ["MSM_BENCH_COORD"],
                num_processes=int(os.environ["MSM_BENCH_NPROCS"]),
                process_id=int(os.environ["MSM_BENCH_PROC_ID"]),
            )
        out = run_scaling_bench(size=args.size, steps=args.steps)
        import jax

        if jax.process_index() == 0:
            _emit(out)
        return
    dt_mode = getattr(args, "dt_mode", "all")
    if dt_mode not in ("both", "all"):
        wait_for_backend()
        _emit(
            run_kdk_bench(
                args.size, args.dims, args.streams or 1, args.steps,
                dt_mode=dt_mode,
            )
        )
        return
    # All dt modes in one run. The HEADLINE is the optimistic mode — the
    # CLI/production DEFAULT (validated-CFL semantics at the lagged
    # interior's cost) — so the advertised number is the number users get.
    # The reference-parity exact mode (two Poisson solves per step, the
    # strict --dt-mode exact semantics) and the unvalidated lagged mode
    # ride along as sub-records with their own roofline fractions
    # (BASELINE.md documents the exact mode's 8-pass floor).
    #
    # FAIL-SOFT STRUCTURE (VERDICT r4 #1): the headline record is emitted
    # the moment it exists; each sub-mode re-emits the merged record as
    # the new last line. Sub-modes only run while the remaining wall
    # budget (MSM_BENCH_BUDGET_S, measured from backend-ready) predicts
    # they can finish — each costs about what the headline did (same
    # grid, a fresh multi-minute remote compile dominates) — otherwise
    # they are recorded as skipped. A driver timeout therefore loses at
    # most the not-yet-finished sub-modes, never the headline.
    import os

    budget_s = float(os.environ.get("MSM_BENCH_BUDGET_S", "900"))
    wait_for_backend()
    t0 = time.monotonic()
    sub_keys = ("value", "vs_baseline", "vs_dma_bound", "steps_per_s")
    _log("measuring headline (optimistic dt)...")
    out = run_kdk_bench(
        args.size, args.dims, args.streams or 1, args.steps, dt_mode="optimistic"
    )
    t_head = time.monotonic() - t0
    out["bench_budget_s"] = budget_s
    _emit(out)
    _log(f"headline done in {t_head:.0f}s: {out['value']:.3e} {out['metric']}")
    for mode, key in (("exact", "exact_dt"), ("lagged", "lagged_dt")):
        remaining = budget_s - (time.monotonic() - t0)
        # self-calibrating cost estimate: a sub-mode compiles+runs the
        # same grid, so the headline's own wall time (x1.3 margin) is
        # the best predictor available
        need = 1.3 * t_head + 30.0
        if remaining < need:
            out[key] = {
                "skipped": (
                    f"wall budget: {remaining:.0f}s left < {need:.0f}s "
                    f"predicted (MSM_BENCH_BUDGET_S={budget_s:.0f})"
                )
            }
            _emit(out)
            _log(f"{mode} dt skipped ({remaining:.0f}s left < {need:.0f}s needed)")
            continue
        _log(f"measuring {mode} dt sub-mode ({remaining:.0f}s budget left)...")
        sub = run_kdk_bench(
            args.size, args.dims, args.streams or 1, args.steps, dt_mode=mode
        )
        out[key] = {k: sub[k] for k in sub_keys}
        _emit(out)

    # Budget-gated EXTRAS, same fail-soft contract (each re-emits the
    # merged record): the ensemble streams/s point (the reference's
    # headline ensemble shape — its seeds loop runs streams sequentially,
    # main.rs:43-79) and the large-grid point at 2x the headline size
    # (512^3 for the default — the reference's largest configured grid).
    # One driver-captured artifact then carries the whole performance
    # picture instead of needing separate bench invocations.
    def _extra(key, need, fn):
        remaining = budget_s - (time.monotonic() - t0)
        if remaining < need:
            out[key] = {
                "skipped": (
                    f"wall budget: {remaining:.0f}s left < {need:.0f}s "
                    f"predicted (MSM_BENCH_BUDGET_S={budget_s:.0f})"
                )
            }
        else:
            _log(f"measuring {key} extra ({remaining:.0f}s budget left)...")
            try:
                out[key] = fn()
            except Exception as e:  # noqa: BLE001 - extras must not kill the artifact
                out[key] = {"error": f"{type(e).__name__}: {e}"}
                _log(f"{key} extra failed: {out[key]['error']}")
        _emit(out)

    _extra(
        "streams",
        max(60.0, 1.5 * t_head) + 60.0,
        lambda: run_ensemble_bench(streams=args.streams or 128),
    )
    _extra(
        "large_grid",
        # 8x the cells of the headline grid, plus compile slack
        8.0 * 1.3 * t_head + 120.0,
        lambda: run_kdk_bench(
            2 * args.size, args.dims, args.streams or 1, args.steps,
            dt_mode="optimistic",
        ),
    )
