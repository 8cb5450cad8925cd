"""Run bench.py until a quiet-window record lands.

The r5 verdict's item 6: every archived r5 record is either stale
(predates the final union content) or burst-stamped. The bench already
stamps a bare-kernel host-probe ratio next to every query — this
runner just LOOPS the whole suite until the worst stamp in a run is
under the acceptance threshold, then saves that run as the round's
record. A cheap pre-probe skips launching the suite at all while a
tenant burst is in progress.

Usage: python BENCH/quiet_bench.py [out.json]
Env:   SPARK_GRAFT_QUIET_MAX      accept threshold on max per-query
                                  probe ratio (default 1.10)
       SPARK_GRAFT_QUIET_TRIES    max suite attempts (default 6)
       SPARK_GRAFT_QUIET_SLEEP    seconds between attempts (default 120)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

MAX_RATIO = float(os.environ.get("SPARK_GRAFT_QUIET_MAX", "1.10"))
TRIES = int(os.environ.get("SPARK_GRAFT_QUIET_TRIES", "6"))
SLEEP = int(os.environ.get("SPARK_GRAFT_QUIET_SLEEP", "120"))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        HERE, "r_quiet_run.json")
    sys.path.insert(0, REPO)
    from bench import PROBE_REF_SEC, make_host_probe

    probe = make_host_probe()
    best_run, best_max = None, float("inf")
    for attempt in range(TRIES):
        pre = probe() / PROBE_REF_SEC
        if pre > MAX_RATIO:
            print(f"attempt {attempt}: pre-probe {pre:.2f} > "
                  f"{MAX_RATIO} — burst in progress, sleeping {SLEEP}s",
                  flush=True)
            time.sleep(SLEEP)
            continue
        t0 = time.time()
        p = subprocess.run([sys.executable, "bench.py"], cwd=REPO,
                           capture_output=True, text=True, timeout=3600)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(f"attempt {attempt}: bench failed\n{p.stdout[-800:]}\n"
                  f"{p.stderr[-800:]}", flush=True)
            time.sleep(SLEEP)
            continue
        rec = json.loads(line[-1])
        ratios = rec["host_probe"]["per_query_ratio"]
        worst = max(ratios.values())
        print(f"attempt {attempt}: suite {rec['value']}s, worst probe "
              f"{worst:.2f} (wall {time.time() - t0:.0f}s)", flush=True)
        if worst < best_max:
            best_run, best_max = rec, worst
        if worst <= MAX_RATIO:
            break
        time.sleep(SLEEP)

    if best_run is None:
        raise SystemExit("no successful bench run")
    best_run["quiet_accepted"] = bool(best_max <= MAX_RATIO)
    best_run["quiet_threshold"] = MAX_RATIO
    with open(out_path, "w") as f:
        json.dump(best_run, f, indent=1)
    print(f"saved {out_path} (max probe {best_max:.2f}, "
          f"accepted={best_run['quiet_accepted']})", flush=True)


if __name__ == "__main__":
    main()
