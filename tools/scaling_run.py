"""Official north-rule scaling measurement with host-calibration bracketing.

    python tools/scaling_run.py [lo] [hi] [n_convs]     # default 4 16 500000

Methodology (BASELINE.md §target-protocol): this burstable VM's parallel
capacity drifts ±40% within minutes, so each pipeline leg is bracketed by
a pure-CPU multiprocessing spin calibration (64 fixed tasks, no JVM) run
at the SAME process count.  Reported:

  eff_raw        = (tps_hi / tps_lo) / (hi / lo)      — the gate as written
  host_ceiling   = (cal_lo / cal_hi) / (hi / lo)      — what the host itself
                                                        delivered during the run
  eff_normalized = eff_raw / host_ceiling             — pipeline scaling
                                                        relative to the host

On a real multi-executor cluster (separate hosts, no shared-JVM/GC
contention, no burst throttling) eff_raw is the number; the architecture
is unchanged.  Each leg runs in a fresh process/JVM via scaling_leg.py.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CAL_TASKS = 64
CAL_LOOP = 2_500_000     # ~0.3 s of pure-Python arithmetic per task


def _spin(_i: int) -> int:
    s = 0
    for j in range(CAL_LOOP):
        s += j * j & 1023
    return s


def calibrate(procs: int) -> float:
    t0 = time.time()
    with mp.Pool(procs) as pool:
        pool.map(_spin, range(CAL_TASKS))
    return round(time.time() - t0, 2)


def run_leg(par: int, n_convs: int) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scaling_leg.py"),
         str(par), str(n_convs)],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    lines = [ln for ln in proc.stdout.strip().splitlines()
             if ln.startswith("{")]
    if proc.returncode != 0 or not lines:
        raise RuntimeError(f"leg local[{par}] failed:\n"
                           f"{(proc.stderr or '')[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_convs = int(sys.argv[3]) if len(sys.argv) > 3 else 500_000

    legs = {}
    cals = {}
    for par in (lo, hi):
        pre = calibrate(par)
        print(f"cal[{par}] pre  {pre}s", flush=True)
        legs[par] = run_leg(par, n_convs)
        print(f"leg local[{par}]  {legs[par]}", flush=True)
        post = calibrate(par)
        print(f"cal[{par}] post {post}s", flush=True)
        cals[par] = (pre, post)

    factor = hi / lo
    eff_raw = (legs[hi]["turns_per_sec"] / legs[lo]["turns_per_sec"]) / factor
    cal_lo = sum(cals[lo]) / 2
    cal_hi = sum(cals[hi]) / 2
    host_ceiling = (cal_lo / cal_hi) / factor
    print(json.dumps({
        "metric": f"kg scaling local[{lo}]->local[{hi}] (host-bracketed)",
        "turns": legs[lo]["turns"],
        f"wall_sec_{lo}": legs[lo]["wall_sec"],
        f"wall_sec_{hi}": legs[hi]["wall_sec"],
        f"turns_per_sec_{lo}": legs[lo]["turns_per_sec"],
        f"turns_per_sec_{hi}": legs[hi]["turns_per_sec"],
        f"cal_{lo}_pre_post": list(cals[lo]),
        f"cal_{hi}_pre_post": list(cals[hi]),
        "eff_raw": round(eff_raw, 3),
        "host_ceiling": round(host_ceiling, 3),
        "eff_normalized": round(eff_raw / host_ceiling, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
