#!/usr/bin/env python
"""Scaling-efficiency evidence for the BASELINE.json criterion.

No real cluster exists in this sandbox, so the N → 4N executor scaling
criterion is evidenced by running the identical extraction job on the
identical input at two parallelism levels (fresh JVM each) and
reporting throughput at both plus

    efficiency = (turns/s @ 4N) / (4 × turns/s @ N)

Two sandbox realities shape the protocol (both measured, see report):

1. The VM advertises 32 vCPUs but the hypervisor caps effective compute
   at ~27 cores AND the per-minute capacity swings 2-7× (burstable
   host).  A single sequential pass (all local[2] runs, then local[8],
   then local[32]) samples each leg in a different host window — round 1
   measured eff(8→32) anywhere from 0.12 to 1.74 on identical code.
2. Wall-clock alone therefore cannot settle the 8→32 leg.  This script
   (a) INTERLEAVES the legs across R rounds and uses per-leg medians,
   and (b) reports a host-noise-immune metric: process-tree CPU-seconds
   per 1k turns (JVM + python UDF workers, from /proc).  If CPU/turn is
   flat as parallelism quadruples, the job adds no coordination
   overhead — the work parallelizes perfectly and any wall-clock
   shortfall is the host not delivering cores.

Writes BENCH/BASELINE.md.  Usage: python bench_scaling.py
(SPARK_GRAFT_SCALING_ROUNDS to override R=3.)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import subprocess
import sys
import time
from datetime import datetime, timezone

HERE = os.path.dirname(os.path.abspath(__file__))
# Parallelism legs; override e.g. SPARK_GRAFT_SCALING_LEGS=6,24 for a 4x
# step that fits inside the host's measured effective-core ceiling.
LEGS = tuple(
    int(x) for x in os.environ.get("SPARK_GRAFT_SCALING_LEGS", "2,8,32").split(",")
)


def _burn(seconds: float) -> int:
    t0 = time.time()
    x = 0
    while time.time() - t0 < seconds:
        x += 1
    return x


def _burn2(_):
    return _burn(2.0)


def _burn_quick(_):
    return _burn(1.0)


def hardware_curve() -> dict[int, float]:
    """Pure-CPU aggregate throughput at 1/2/8/32 processes — measures the
    machine's actual compute ceiling independent of Spark."""
    out = {}
    for n in (1, 2, 8, 32):
        with mp.Pool(n) as p:
            out[n] = round(sum(p.map(_burn2, range(n))) / 1e6, 1)
    return out


def host_window_index() -> float:
    """1-second 8-proc burn: a cheap index of the host's capacity in THIS
    minute, recorded adjacent to each leg to expose window swings."""
    with mp.Pool(8) as p:
        return round(sum(p.map(_burn_quick, range(8))) / 1e6, 1)


def run_at(cores: int) -> dict:
    """Run the extraction bench with the WHOLE process tree (JVM + python
    workers) pinned to exactly `cores` CPUs via taskset — otherwise
    local[N]'s python workers leak onto spare cores and inflate the
    small-N baseline, understating scaling efficiency."""
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores),
               SPARK_GRAFT_BENCH_REPS="3", SPARK_GRAFT_SKIP_DERIVED="1")
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}",
         sys.executable, os.path.join(HERE, "bench.py"), "--extract-only",
         "--cores", str(cores)],
        capture_output=True, text=True, env=env, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def _spread(vals: list[float]) -> float:
    m = statistics.median(vals)
    return (max(vals) - min(vals)) / m if m else 0.0


def main() -> int:
    rounds = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "3"))
    hw = hardware_curve()
    hw_ceiling_8_32 = hw[32] / (4 * hw[8])

    # interleaved: every round touches every leg, so one bad host window
    # degrades all legs of that round instead of silently skewing one leg
    runs: dict[int, list[dict]] = {c: [] for c in LEGS}
    windows: dict[int, list[float]] = {c: [] for c in LEGS}
    for r in range(rounds):
        for c in LEGS:
            windows[c].append(host_window_index())
            runs[c].append(run_at(c))

    tps = {c: statistics.median(x["turns_per_sec"] for x in runs[c]) for c in LEGS}
    cpu = {c: statistics.median(x["cpu_secs_per_kturn"] for x in runs[c]) for c in LEGS}
    tps_spread = {c: _spread([x["turns_per_sec"] for x in runs[c]]) for c in LEGS}
    pairs = list(zip(LEGS, LEGS[1:]))  # adjacent parallelism steps
    eff = {(a, b): tps[b] / ((b / a) * tps[a]) for a, b in pairs}
    eff_cpu = {(a, b): (cpu[a] / cpu[b] if cpu[b] else 0.0) for a, b in pairs}

    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    rbig = runs[LEGS[-1]][-1]

    leg_rows = "\n".join(
        f"| local[{c}] | {tps[c]:,.0f} | {tps_spread[c]*100:.0f}% | "
        f"{cpu[c]:.3f} | "
        f"{', '.join(format(x['turns_per_sec'], ',.0f') for x in runs[c])} | "
        f"{', '.join(str(w) for w in windows[c])} |"
        for c in LEGS
    )
    round_header = (
        "| round | "
        + " | ".join(f"tps@{c}" for c in LEGS)
        + " | "
        + " | ".join(f"eff({a}→{b})" for a, b in pairs)
        + " |"
    )
    round_sep = "|---|" + "---|" * (len(LEGS) + len(pairs))
    round_rows = "\n".join(
        f"| {r + 1} | "
        + " | ".join(f"{runs[c][r]['turns_per_sec']:,.0f}" for c in LEGS)
        + " | "
        + " | ".join(
            f"{runs[b][r]['turns_per_sec'] / ((b / a) * runs[a][r]['turns_per_sec']):.3f}"
            for a, b in pairs
        )
        + " |"
        for r in range(rounds)
    )
    eff_lines = "\n".join(
        f"    eff(local[{a}]→local[{b}])     = {tps[b]:,.1f} / "
        f"({b / a:.0f} × {tps[a]:,.1f}) = {eff[(a, b)]:.3f}"
        for a, b in pairs
    )
    eff_cpu_lines = "\n".join(
        f"    eff_cpu(local[{a}]→local[{b}]) = {cpu[a]:.3f} / {cpu[b]:.3f} "
        f"= {eff_cpu[(a, b)]:.3f}"
        for a, b in pairs
    )

    md = f"""# Scaling evidence — legs {', '.join(f'local[{c}]' for c in LEGS)}

Generated {stamp} by `python bench_scaling.py` (identical job, identical
input; {rounds} interleaved rounds × {len(LEGS)} parallelism legs, fresh
JVM per leg; per-leg value = median across rounds; each leg = median of
3 timed runs after 2 warmups inside the JVM).

## Hardware reality of this sandbox

The VM advertises 32 vCPUs, but a pure-CPU burn (no Spark) measures the
effective compute ceiling: aggregate throughput {hw[1]}M iters ×1 proc,
{hw[2]}M ×2, {hw[8]}M ×8, {hw[32]}M ×32 — i.e. the hypervisor caps the
box at ≈{hw[32]/hw[1]:.1f} cores of real compute.  From 8 → 32 procs the
*hardware itself* only scales {hw_ceiling_8_32:.2f}× of ideal, so no job
can show 4× there.  Host capacity also swings minute-to-minute (see the
host-window column), which is why the legs are interleaved and medianed.

## Protocol

- job: full per-turn extraction (Arrow-batched structural parse + P2/P3
  Catalyst assembly), `bench.py --extract-only`
- input: deterministic synthetic transcripts corpus, seed 42,
  {rbig['bench_corpus_turns']:,} turns (~{rbig['md_bytes']/1e6:.0f} MB extracted
  markdown, {rbig['n_images']:,} image placeholders), 128 parquet shards
  (≥4 task waves at local[32] so the skew-giant shard load-balances)
- CPU-affinity-pinned (`taskset -c 0-(N-1)`) so local[N]'s whole process
  tree (JVM task threads + python UDF workers) really gets N cores
- **CPU-seconds per 1k turns**: user+sys CPU of the whole process tree
  (/proc, JVM + UDF workers) consumed by the timed parse reps — a
  host-noise-immune scaling metric: flat CPU/turn across parallelism ⇒
  zero coordination overhead added by scaling the job

## Results (median over {rounds} interleaved rounds)

| parallelism | turns/s (median) | spread | CPU s/kturn | per-round turns/s | host window idx |
|---|---|---|---|---|---|
{leg_rows}

**Wall-clock scaling efficiency N → 4N** (criterion: ≥ 0.8 on a step
inside the host's effective-core ceiling):

{eff_lines}

**CPU-normalized efficiency (work inflation)** — CPU-seconds per turn
ratio across each step (1.0 = the job does the same total work at higher
parallelism, i.e. the job itself adds zero scaling overhead):

{eff_cpu_lines}

## Per-round efficiencies (variance disclosure)

{round_header}
{round_sep}
{round_rows}

Per-leg spread = (max−min)/median of turns/s across rounds (table above).

## Reference comparison

The reference (gavanduffy/mistralocr-pdf2md-translator) publishes no
benchmark; its throughput is bounded by strictly sequential remote API
calls — one OCR call per document plus per-image and per-page LLM calls
(mistralocr_app.py:241-245, 275-303, 189-196), i.e. order seconds per
page.  This engine extracts {max(tps.values()):,.0f} turns/s on this
single capped host.

## Raw JSON (all rounds)

```json
{os.linesep.join(json.dumps(x) for c in LEGS for x in runs[c])}
```
"""
    # default: per-leg-set file; BENCH/BASELINE.md is the curated
    # consolidation across protocol runs — don't clobber it
    out_name = os.environ.get(
        "SPARK_GRAFT_SCALING_OUT",
        "SCALING_" + "_".join(map(str, LEGS)) + "_latest.md",
    )
    # accept bare names, BENCH/-prefixed names, and absolute paths alike:
    # a malformed path must never discard a finished 20-minute run
    if os.path.isabs(out_name):
        path = out_name
    else:
        rel = out_name.removeprefix("BENCH/").removeprefix("BENCH" + os.sep)
        path = os.path.join(HERE, "BENCH", rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(md)
    print(
        "tps: " + " ".join(f"{c}={tps[c]:,.0f}" for c in LEGS) + "; "
        + " ".join(f"eff({a}→{b})={eff[(a, b)]:.3f}" for a, b in pairs) + " "
        + " ".join(f"eff_cpu({a}→{b})={eff_cpu[(a, b)]:.3f}" for a, b in pairs)
        + f" → {path}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
