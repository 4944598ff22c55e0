#!/usr/bin/env python
"""Scaling-efficiency evidence for the BASELINE.json criterion.

No real cluster exists in this sandbox, so the N → 4N executor scaling
criterion is evidenced by running the identical extraction job on the
identical input at two parallelism levels (fresh JVM each) and
reporting throughput at both plus

    efficiency = (turns/s @ 4N) / (4 × turns/s @ N)

The sandbox VM advertises 32 vCPUs but is hypervisor-capped at ~8.6
cores of effective compute (measured below with a pure-CPU burn, and
recorded in the report) — beyond ~8 threads there is no additional
hardware to scale onto.  The N → 4N evidence therefore uses
local[2] → local[8], which lies inside the linear region of the
machine's own scaling curve; local[8] → local[32] is also reported,
with the measured hardware ceiling alongside.

Writes BENCH/BASELINE.md.  Usage: python bench_scaling.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

HERE = os.path.dirname(os.path.abspath(__file__))


def _burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 2:
        x += 1
    return x


def hardware_curve() -> dict[int, float]:
    """Pure-CPU aggregate throughput at 1/2/8/32 processes — measures the
    machine's actual compute ceiling independent of Spark."""
    out = {}
    for n in (1, 2, 8, 32):
        with mp.Pool(n) as p:
            out[n] = round(sum(p.map(_burn, range(n))) / 1e6, 1)
    return out


def run_at(cores: int) -> dict:
    """Run the extraction bench with the WHOLE process tree (JVM + python
    workers) pinned to exactly `cores` CPUs via taskset — otherwise
    local[N]'s python workers leak onto extra cores and inflate the
    small-N baseline, understating scaling efficiency."""
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores),
               SPARK_GRAFT_BENCH_REPS="5", SPARK_GRAFT_SKIP_DERIVED="1")
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}",
         sys.executable, os.path.join(HERE, "bench.py"), "--extract-only",
         "--cores", str(cores)],
        capture_output=True, text=True, env=env, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    hw = hardware_curve()
    runs = {c: run_at(c) for c in (2, 8, 32)}
    tps = {c: r["turns_per_sec"] for c, r in runs.items()}
    eff_2_8 = tps[8] / (4 * tps[2])
    eff_8_32 = tps[32] / (4 * tps[8])
    hw_ceiling_8_32 = hw[32] / (4 * hw[8])

    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    r = runs[32]
    def _fmt(v):
        return str(v) if v else "—"

    rows = "\n".join(
        f"| local[{c}] | {runs[c]['queries']['extract_turns']} | "
        f"{tps[c]:,.0f} | {_fmt(runs[c]['queries']['extract_docs'])} | "
        f"{_fmt(runs[c]['queries']['extract_spans'])} |"
        for c in (2, 8, 32)
    )
    md = f"""# BENCH/BASELINE — measured throughput & scaling evidence

Generated {stamp} by `python bench_scaling.py` (identical job, identical
input, fresh JVM per parallelism level; throughput = median of 3 runs
after 2 warmups, isolating steady-state from single-JVM JIT warmup).

## Hardware reality of this sandbox

The VM advertises 32 vCPUs, but a pure-CPU burn (no Spark) measures the
effective compute ceiling: aggregate throughput {hw[1]}M iters ×1 proc,
{hw[2]}M ×2, {hw[8]}M ×8, {hw[32]}M ×32 — i.e. the hypervisor caps the
box at ≈{hw[32]/hw[1]:.1f} cores of real compute.  From 8 → 32 procs the
*hardware itself* only scales {hw_ceiling_8_32:.2f}× of ideal, so no job
can show 4× there.  The N → 4N criterion is therefore evidenced at
local[2] → local[8], inside the machine's linear region (hardware there
scales {hw[8]/(4*hw[2]):.2f} of ideal).

## Protocol

- job: full per-turn extraction (Arrow-batched structural parse + P2/P3
  Catalyst assembly), `bench.py --extract-only`
- input: deterministic synthetic transcripts corpus, seed 42,
  {r['bench_corpus_turns']:,} turns (~{r['md_bytes']/1e6:.0f} MB extracted
  markdown, {r['n_images']:,} image placeholders), 32 parquet shards
- each run is CPU-affinity-pinned (`taskset -c 0-(N-1)`) so local[N]'s
  whole process tree (JVM task threads + python UDF workers) really gets
  N cores — without pinning, local[2]'s python workers leak onto spare
  cores and inflate the small-N baseline

## Results

| parallelism | parse wall (s) | turns/s | docs (s) | spans (s) |
|---|---|---|---|---|
{rows}

**Scaling efficiency N → 4N (local[2] → local[8]): {eff_2_8:.3f}**
(criterion: ≥ 0.8)

    efficiency = (turns/s @ local[8]) / (4 × turns/s @ local[2])
               = {tps[8]:,.1f} / (4 × {tps[2]:,.1f}) = {eff_2_8:.3f}

local[8] → local[32]: {eff_8_32:.3f} against a measured hardware ceiling
of {hw_ceiling_8_32:.3f} for the same step — i.e. the job reaches
{min(1.0, eff_8_32/hw_ceiling_8_32)*100:.0f}% of what the capped CPUs
physically allow.

## Reference comparison

The reference (gavanduffy/mistralocr-pdf2md-translator) publishes no
benchmark; its throughput is bounded by strictly sequential remote API
calls — one OCR call per document plus per-image and per-page LLM calls
(mistralocr_app.py:241-245, 275-303, 189-196), i.e. order seconds per
page.  This engine extracts {tps[32]:,.0f} turns/s on this single capped
host.

## Raw JSON

```json
{os.linesep.join(json.dumps(runs[c]) for c in (2, 8, 32))}
```
"""
    path = os.path.join(HERE, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(md)
    print(
        f"tps: 2={tps[2]:,.0f} 8={tps[8]:,.0f} 32={tps[32]:,.0f}; "
        f"eff(2→8)={eff_2_8:.3f} eff(8→32)={eff_8_32:.3f} "
        f"hw-ceiling(8→32)={hw_ceiling_8_32:.3f} → {path}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
