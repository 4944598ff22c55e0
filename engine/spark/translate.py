"""Translation stage with the reference's error-channel semantics (T1).

The reference translates page-by-page via remote LLMs
(/root/reference/mistralocr_app.py:141-221); on any failure it does NOT
abort — it yields a marker page

    --- ERROR: Translation Failed for Page {idx+1} ---\n\n{page}

(mistralocr_app.py:161, :183, :203, :216) and keeps going, so the
per-page output list stays aligned.  Here the translation itself is a
pluggable deterministic stand-in (the north star replaces remote API
calls); the error-channel and document-assembly semantics
(mistralocr_app.py:717) are preserved exactly, as Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from engine.core import spec
from engine.spark import assemble


def error_marker(turn_idx: Column, page: Column) -> Column:
    """Exact marker-page format of mistralocr_app.py:216."""
    return F.concat(
        F.lit("--- ERROR: Translation Failed for Page "),
        (turn_idx + 1).cast("string"),
        F.lit(" ---\n\n"),
        page,
    )


def fake_translation(markdown: Column) -> Column:
    """Deterministic local stand-in for the remote translation call:
    tags the page as translated.  Swap for a real translator UDF in
    production; everything downstream is unchanged."""
    return F.concat(F.lit("> [translated zh-TW]\n\n"), markdown)


def translate_turns(
    turns: DataFrame,
    fail_when: Column | None = None,
    markdown_col: str = "markdown",
) -> DataFrame:
    """Adds a ``translated`` column; rows matching ``fail_when`` get the
    reference's error-marker page instead of a translation (per-page
    failure isolation, mistralocr_app.py:211-216)."""
    md = F.col(markdown_col)
    ok = fake_translation(md)
    if fail_when is None:
        translated = ok
    else:
        translated = F.when(fail_when, error_marker(F.col("turn_idx"), md)).otherwise(ok)
    return turns.withColumn("translated", translated)


def translated_docs(turns: DataFrame, chunk: int = 1024) -> DataFrame:
    """Per-conversation translated document (mistralocr_app.py:717)."""
    t = turns.select(
        "conv_id", "turn_idx", F.col("translated").alias("markdown")
    )
    return assemble.assemble_docs(t, chunk=chunk, sep=spec.DOC_JOIN)
