#!/usr/bin/env python
"""8 → 32 scaling-gap profiler (VERDICT r4 next #2).

Runs the extract-only bench leg at local[8] and local[32] (taskset
pinned, same protocol as bench.py's embedded legs) under controlled
config variants, bracketed by ALU + memory-bandwidth burns, to
attribute the observed eff(8→32) ≈ 0.62 when the ALU ceiling reads
≈ 1.0:

  base      — the shipping session config
  arrow16k  — Arrow maxRecordsPerBatch 4096 → 16384 (fewer, larger
              batches across the serialize/IPC boundary)
  arrow1k   — 4096 → 1024 (the opposite direction, to bracket)
  parallelgc— -XX:+UseParallelGC (Java 17 default is G1; throughput
              collector trades pause time for mutator throughput)
  gclog     — base + -Xlog:gc so the GC pause fraction of the wall can
              be measured directly at both core counts

Output: one JSON line per (variant, cores) with turns/sec, CPU
secs/kturn, adjacent ALU window index, and (for gclog) total GC pause
seconds parsed from the unified log.  Consolidation → BENCH/BASELINE.md.
"""

from __future__ import annotations

import glob
import json
import multiprocessing as mp
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _burn1s, _memburn1s  # noqa: E402


def burn(c: int, fn) -> float:
    with mp.Pool(c) as p:
        return round(sum(p.map(fn, range(c))) / (1e6 if fn is _burn1s else 1), 1)


VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "arrow16k": {"spark.sql.execution.arrow.maxRecordsPerBatch": "16384"},
    "arrow1k": {"spark.sql.execution.arrow.maxRecordsPerBatch": "1024"},
    "parallelgc": {"spark.driver.extraJavaOptions": "-XX:+UseParallelGC"},
    "gclog": {
        "spark.driver.extraJavaOptions": "-Xlog:gc:file=/tmp/profile_gc_%p.log"
    },
}


def gc_pause_secs() -> float:
    """Sum GC pause ms from unified-logging files written since start."""
    total = 0.0
    for f in glob.glob("/tmp/profile_gc_*.log"):
        try:
            for line in open(f):
                m = re.search(r"Pause [^)]*\)[^0-9]*([0-9.]+)ms", line)
                if m:
                    total += float(m.group(1)) / 1000.0
        except OSError:
            pass
    return round(total, 2)


def one_leg(cores: int, conf: dict[str, str]) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_BENCH_REPS="3",
        SPARK_GRAFT_SKIP_DERIVED="1",
        SPARK_GRAFT_EXTRA_CONF=json.dumps(conf),
    )
    res = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable,
         os.path.join(REPO, "bench.py"), "--extract-only",
         "--cores", str(cores)],
        capture_output=True, text=True, env=env, check=True,
    )
    line = [l for l in res.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    variants = (
        sys.argv[1].split(",") if len(sys.argv) > 1 else list(VARIANTS)
    )
    rows = []
    for name in variants:
        conf = VARIANTS[name]
        for f in glob.glob("/tmp/profile_gc_*.log"):
            os.unlink(f)
        rec: dict = {"variant": name}
        for c in (8, 32):
            alu = burn(c, _burn1s)
            memb = burn(c, _memburn1s)
            gc0 = gc_pause_secs()
            t0 = time.time()
            leg = one_leg(c, conf)
            wall = round(time.time() - t0, 1)
            rec[str(c)] = {
                "tps": leg["turns_per_sec"],
                "cpu_per_kturn": leg["cpu_secs_per_kturn"],
                "alu_burn": alu,
                "mem_burn": memb,
                "leg_wall": wall,
                "gc_secs": round(gc_pause_secs() - gc0, 2)
                if name == "gclog" else None,
            }
        rec["eff_8_32"] = round(
            rec["32"]["tps"] / (4 * rec["8"]["tps"]), 3
        )
        rec["eff_cpu_8_32"] = round(
            rec["8"]["cpu_per_kturn"] / rec["32"]["cpu_per_kturn"], 3
        ) if rec["32"]["cpu_per_kturn"] else 0.0
        rec["alu_ceiling_8_32"] = round(
            rec["32"]["alu_burn"] / (4 * rec["8"]["alu_burn"]), 3
        )
        rec["mem_ceiling_8_32"] = round(
            rec["32"]["mem_burn"] / (4 * rec["8"]["mem_burn"]), 3
        )
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
