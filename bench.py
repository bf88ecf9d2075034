#!/usr/bin/env python
"""Benchmark entry: 3-D KDK grid-update throughput on one chip.

Prints JSON lines {"metric", "value", "unit", "vs_baseline", ...} to
stdout — FAIL-SOFT: the optimistic-dt headline record is flushed the
moment that first measurement completes; each sub-mode (exact/lagged dt)
then re-prints the merged record as the new last line. Parse the LAST
complete JSON line. Sub-modes are gated by a wall budget
(MSM_BENCH_BUDGET_S, default 900 s from backend-ready) and recorded as
{"skipped": reason} when the budget predicts they cannot finish, so a
harness timeout loses at most unfinished sub-modes, never the headline.
Progress/heartbeat lines (including the chip-grant-stall wait) go to
stderr.

The reference publishes no benchmark numbers (BASELINE.md), so
`vs_baseline` is the fraction of the analytic speed-of-light HBM roofline
for this chip (a KDK step is bandwidth-bound: 6 grid FFTs + elementwise
phase rotations over the complex grid).
"""

import argparse
import sys


def main() -> None:
    parser = argparse.ArgumentParser()
    # size/steps default PER METRIC (benchmarks.main): kdk 256/100,
    # scaling 64/5 — the scaling sweep scales the GLOBAL grid to keep
    # size^dims per device, so kdk's 256 default would build >=512^3
    # global grids on the CPU rehearsal (hours, not minutes)
    parser.add_argument("--size", type=int, default=None)
    parser.add_argument("--dims", type=int, default=3)
    # default: 1 stream for the kdk metric, 128 for the ensemble metric
    parser.add_argument("--streams", type=int, default=None)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument(
        "--dt-mode",
        choices=("optimistic", "exact", "lagged", "all", "both"),
        default="all",
        dest="dt_mode",
        help="all (default): headline = optimistic (the CLI/production "
        "default dt semantics) with the reference-parity exact mode and "
        "the lagged mode as sub-records; or one mode alone. 'both' is a "
        "legacy alias for all",
    )
    parser.add_argument(
        "--metric",
        choices=("kdk", "streams", "scaling"),
        default="kdk",
        help="kdk: grid-updates/s on one big grid; streams: ensemble "
        "streams/s; scaling: weak-scaling sweep over the device mesh",
    )
    parser.add_argument(
        "--processes",
        type=int,
        default=1,
        help="scaling metric only: spawn N jax.distributed processes (the "
        "2-process CPU rehearsal of the pod-slice run; workers bootstrap "
        "over loopback like tests/test_multihost_spatial.py)",
    )
    parser.add_argument(
        "--devices-per-proc",
        type=int,
        default=4,
        dest="devices_per_proc",
        help="virtual CPU devices per spawned process (scaling rehearsal)",
    )
    args = parser.parse_args()

    from msm_tpu.utils import benchmarks

    benchmarks.main(args)


if __name__ == "__main__":
    sys.exit(main())
