#!/usr/bin/env python
"""Per-query scaling of the FULL headline suite at two parallelism
levels (default local[8] vs local[32], fresh JVM per run).

The flagship-job harness (run_scaling.py) evidences the north-rule
criterion on one scale-shaped job; this one answers a different
question: does EVERY headline operator's plan shape survive a 4x width
change, or does some shuffle/broadcast/fan-out only look good at one
width? Output is a per-query table of wall-clock at both widths +
efficiency = (t_lo / t_hi) / (hi / lo), with queries whose efficiency
falls far below the suite median flagged for plan review.

Methodology (same discipline as run_scaling.py, noisy shared host):
interleaved repeats (lo, hi, lo, hi, ...), per-query MIN across the
repeats at each width (bench.py itself is already best-of-3 per query
inside one JVM), host multiprocessing probe as the hardware ceiling for
the same pair. Serial per-query efficiency on a shared box is noisy —
treat the per-query numbers as a SHAPE diagnostic (relative to the
suite median), not as isolated truths.

Usage: python BENCH/suite_scaling.py
Env: SPARK_GRAFT_SCALING_LO/HI (8/32), SPARK_GRAFT_SUITE_REPEATS (2),
     SPARK_GRAFT_SF_DIR (/root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    # the 2 GB blocked capability proof is ~2 min of host-transfer-bound
    # work whose output this harness never reads (the table uses
    # res['queries'] + res['scaled_4x'] only) — and it churns GBs right
    # before timed entries; the wire A/B likewise isn't a scaling signal
    env.setdefault("SPARK_GRAFT_BENCH_BLOCKED", "0")
    env.setdefault("SPARK_GRAFT_BENCH_WIRE", "0")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=3600, env=env, cwd=REPO,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"bench.py produced no JSON at cpus={cpus}:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    lo = int(os.environ.get("SPARK_GRAFT_SCALING_LO", "8"))
    hi = int(os.environ.get("SPARK_GRAFT_SCALING_HI", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_SUITE_REPEATS", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    best: dict[int, dict[str, float]] = {lo: {}, hi: {}}
    for i in range(repeats):
        for cpus in (lo, hi):
            res = run_bench(cpus, sf_dir)
            timed = dict(res["queries"])
            # the 4x-input variants of the multi-second queries are the
            # entries with real scaling signal (the sf0.1 headline is
            # majority sub-second and scheduler-bound)
            for q, t in res.get("scaled_4x", {}).get("queries", {}).items():
                timed[f"4x:{q}"] = t
            for q, t in timed.items():
                prev = best[cpus].get(q)
                best[cpus][q] = t if prev is None else min(prev, t)
            print(f"# repeat {i} cpus={cpus}: suite {res['value']:.1f}s", file=sys.stderr)

    factor = hi / lo
    rows = []
    for q in best[lo]:
        t_lo, t_hi = best[lo][q], best[hi].get(q)
        if t_hi is None or t_hi <= 0:
            continue
        sp = t_lo / t_hi
        rows.append({"query": q, f"t{lo}": t_lo, f"t{hi}": t_hi,
                     "speedup": round(sp, 2), "efficiency": round(sp / factor, 3)})
    # the suite_* aggregates and the flag median stay HEADLINE-ONLY so
    # they remain comparable round-over-round (the 4x: population is
    # systematically higher-efficiency and would shift both); the 4x
    # rows ride in the same table and get their own summary block
    head = [r for r in rows if not r["query"].startswith("4x:")]
    four = [r for r in rows if r["query"].startswith("4x:")]
    effs = sorted(r["efficiency"] for r in head)
    median = effs[len(effs) // 2] if effs else 0.0
    for r in rows:
        # flag shapes well below the headline median: on a shared host
        # absolute efficiency is noise-limited, relative collapse is
        # signal. ALSO flag core-count INVERSIONS outright — more cores
        # making a multi-second query slower is a plan/scheduler defect
        # whatever the median is doing (sub-second queries are
        # scheduler-latency-bound, so the inversion test only applies
        # above 2 s at the low width; r05 cell_cover_join 5.67->7.96 s
        # was exactly this and the old flag logic missed it)
        r["flag"] = bool(r["efficiency"] < 0.5 * median
                         or (r["speedup"] < 1.0 and r[f"t{lo}"] >= 2.0))
    sys.path.insert(0, REPO)
    from BENCH.run_scaling import host_probe

    def _sums(pop):
        s_lo = sum(best[lo][r["query"]] for r in pop)
        s_hi = sum(best[hi][r["query"]] for r in pop)
        return {
            "lo_sec": round(s_lo, 2), "hi_sec": round(s_hi, 2),
            "speedup": round(s_lo / max(s_hi, 1e-9), 2),
            "efficiency": round(s_lo / max(s_hi, 1e-9) / factor, 3),
        }

    probe = host_probe(lo, hi)
    hsum = _sums(head)
    out = {
        "metric": f"headline suite per-query scaling local[{lo}] -> local[{hi}]",
        "sf_dir": sf_dir,
        "suite_lo_sec": hsum["lo_sec"],
        "suite_hi_sec": hsum["hi_sec"],
        "suite_speedup": hsum["speedup"],
        "suite_efficiency": hsum["efficiency"],
        "scaled_4x_suite": _sums(four) if four else None,
        "median_query_efficiency": median,
        "host_kernel_speedup": round(probe["speedup"], 2),
        "queries": sorted(rows, key=lambda r: -r[f"t{hi}"]),
        "flagged": [r["query"] for r in rows if r["flag"]],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
