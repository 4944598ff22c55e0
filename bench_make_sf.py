#!/usr/bin/env python
"""Make a K-times scaled copy of a testdata sf dir for LOCAL perf
measurement only (the driver generates its own large sf; /root/testdata
is read-only).  Never used by bench.py or any declared query.

Scaling is key-shifted replication so every FK keeps its 1:N fan-out
(join selectivities and group sizes match a natively bigger sf):

  * region/nation: copied (fixed dimension tables, as in TPC-H).
  * customer/supplier/part/orders/lineitem/events: replica r shifts
    every key column by r * (max_key + 1); non-key columns unchanged.
  * documents: doc_id shifted; for r > 0 every word gets a ``~r``
    suffix — token count and dup structure per replica are preserved
    (equal texts stay equal inside a replica) while shingles across
    replicas are disjoint, so dup/minhash cluster sizes stay constant
    and cluster count scales, like a natively bigger corpus.
  * embeddings: vec_id shifted; deterministic per-replica noise added
    so replicas are not bitwise-identical vectors (no fake zero
    distances in ANN paths).

    python bench_make_sf.py /root/testdata/sf0.1 /root/sfdata/sf1.0 10
"""
from __future__ import annotations

import os
import re
import sys

import numpy as np
import pandas as pd

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation"]
# which (table, column) defines each key's domain span (max+1)
DOMAIN = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

_word = re.compile(r"[A-Za-z0-9]+")


def main() -> int:
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    # key domain spans (max+1 over the domain table); shifting by r*span
    # keeps replicas' key ranges disjoint and every FK valid
    span = {
        c: int(
            pd.read_parquet(f"{src}/{t}.parquet", columns=[col])[col].max()
        ) + 1
        for c, (t, col) in DOMAIN.items()
    }
    for t in COPY:
        pd.read_parquet(f"{src}/{t}.parquet").to_parquet(
            f"{dst}/{t}.parquet", index=False
        )
        print(f"copied {t}")
    for t, keys in SHIFT_COLS.items():
        base = pd.read_parquet(f"{src}/{t}.parquet")
        reps = []
        for r in range(k):
            d = base.copy()
            for c in keys:
                d[c] = d[c] + r * span[c]
            if t == "documents" and r > 0:
                suf = f"~{r}"
                d["text"] = d["text"].map(
                    lambda s: _word.sub(lambda m: m.group(0) + suf, s)
                )
                d["n_chars"] = d["text"].str.len().astype(base["n_chars"].dtype)
            if t == "embeddings" and r > 0:
                rng = np.random.RandomState(1000 + r)
                d["embedding"] = d["embedding"].map(
                    lambda v: (
                        np.asarray(v, dtype=np.float32)
                        + rng.normal(0, 0.02, len(v)).astype(np.float32)
                    ).tolist()
                )
            reps.append(d)
        out = pd.concat(reps, ignore_index=True)
        out.to_parquet(f"{dst}/{t}.parquet", index=False)
        print(f"{t}: {len(base)} -> {len(out)}")
    open(os.path.join(dst, "_DONE"), "w").close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
