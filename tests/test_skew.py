"""Skew stress: one conversation far longer than the rest plus a ~MB
single turn (the north rule's skewed-long-document case) must not break
correctness — and the chunked assembly must bound reducer state.
"""

import pandas as pd
import pytest

from engine import oracle
from engine.core import spec
from engine.spark import pipeline
from engine.spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=4, shuffle_partitions=8, app="engine-tests")
    yield s
    s.stop()


def _skewed_frame() -> pd.DataFrame:
    rows = []
    # 1 long conversation: 2000 turns
    for t in range(2000):
        rows.append(("conv-long", t, f"# H{t}\n\npara {t} text"))
    # a giant single turn (~1 MB)
    rows.append(("conv-giant", 0, "word " * 200_000))
    # small controls
    for c in range(5):
        for t in range(3):
            rows.append((f"conv-small-{c}", t, f"small {c} {t}"))
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"]).astype(
        {"turn_idx": "int32"}
    )


def test_skewed_conversation_byte_parity(spark, tmp_path):
    pdf = _skewed_frame()
    p = str(tmp_path / "skew.parquet")
    pdf.to_parquet(p, index=False)
    df = spark.read.parquet(p)

    turns = pipeline.extract_turns(df)
    docs = pipeline.extract_docs(turns, chunk=128).orderBy("conv_id").toPandas()

    golden = oracle.process_table(
        [(c, int(t), x) for c, t, x in pdf.itertuples(index=False)]
    )
    want = oracle.assemble_docs(golden)
    assert len(docs) == len(want)
    for _, row in docs.iterrows():
        assert row["markdown"] == want[row["conv_id"]], row["conv_id"]

    # the long doc really contains all 2000 turns in order
    long_md = docs.set_index("conv_id").loc["conv-long", "markdown"]
    assert long_md.count(spec.DOC_JOIN) == 1999
    assert long_md.startswith("# H0\n\npara 0 text")
    assert long_md.endswith("# H1999\n\npara 1999 text")

    # giant turn survives intact
    giant = docs.set_index("conv_id").loc["conv-giant", "markdown"]
    assert len(giant) > 900_000
