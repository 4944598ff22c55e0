#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4) — NOT the frozen driver bench.

Times individual declared queries with the exact protocol of bench.py
(1 warmup + median of 3 noop-sink reps; construct-heavy queries rebuilt
inside the timed job) so before/after numbers in OPTIMIZATION_r06.md are
comparable with the driver's per-query seconds.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py q1 q2 ...
    python bench_extra.py --plan q1        # dump .explain("formatted")
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

CONSTRUCT_HEAVY = {
    "dup_clusters",
    "ivf_quantized",
    "bloom_semi_join",
    "substring_search",
    "bpe_train",
    "mad_flags",
    "leakage_safe_split",
    "incremental_clusters",
}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plan", action="store_true", help="print explain only")
    ap.add_argument("--plan-dir", default=None, help="write plans to dir")
    ap.add_argument("--suffix", default="", help="plan filename suffix")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from engine.spark.session import get_spark

    spark = get_spark(cores=cores, app="bench-extra")
    import __spark_entry__ as entry_mod

    qmap = entry_mod.queries()
    out: dict[str, float] = {}
    for name in args.names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if args.plan or args.plan_dir:
            plan = qmap[name](spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            if args.plan_dir:
                os.makedirs(args.plan_dir, exist_ok=True)
                fn = f"{name}{args.suffix}.txt"
                with open(os.path.join(args.plan_dir, fn), "w") as f:
                    f.write(plan)
                print(f"wrote {args.plan_dir}/{fn}", flush=True)
            else:
                print(f"===== {name} =====\n{plan}", flush=True)
            continue
        if name in CONSTRUCT_HEAVY:
            job = lambda: (
                qmap[name](spark, sf_dir)
                .write.format("noop").mode("overwrite").save()
            )
        else:
            df = qmap[name](spark, sf_dir)
            job = lambda: df.write.format("noop").mode("overwrite").save()
        job()  # warmup
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            job()
            times.append(time.time() - t0)
        out[name] = round(statistics.median(times), 2)
        print(f"{name}: {out[name]} (reps: {[round(t, 2) for t in times]})",
              flush=True)
    if out:
        print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
