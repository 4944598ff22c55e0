"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship extraction on sf0.001;
``queries()`` exposes one callable per implemented operator
(SURVEY.md §2 + the training-data-pipeline ops); ``oracle_sql()``
gives the DuckDB-equivalent SQL for every SQL-expressible one.

Column names and types are aligned between both sides; doubles from
cross-engine aggregations are rounded (exact decimal sums underneath)
so value hashes match.
"""

from __future__ import annotations

import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine.core import spec
from engine.spark import (
    analytics,
    assemble,
    conversation,
    dedup,
    diagnose,
    joins,
    lineage,
    mix,
    multimodal,
    pipeline,
    similarity,
    zorder,
)
from engine.spark import text as etext


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- extraction
# documents.text doubles as the turn payload: conv 'doc-{id}', single turn.
_PAYLOAD_SUFFIX = "\n\n![img-1.jpeg](img-1.jpeg)\n"


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin an under-partitioned frame to the session's core
    count — applied PER QUERY, only where the downstream work is
    expression-bound (regex suites, tokenize+explode, per-vector HOF
    folds, JSON parse, mapInPandas parse).  The sf tables are single
    parquet files with one row group for documents/embeddings/events,
    and a row group is the minimum scan split — so those scans yield
    ONE task however many cores exist, serializing everything
    pipelined into them; one tiny exchange buys full-width execution
    (measured 2-8× on the heavy consumers).  Deliberately NOT a
    blanket rule in _t: a cheap projection/agg query pays the exchange
    without recouping it (measured +0.3-1.3 s flat tax per query when
    documents was redistributed table-wide), and fact tables' queries
    open with a keyed exchange anyway.  Scale-adaptive: no-op when
    the input already has at least defaultParallelism partitions
    (multi-file tables at real scale skip this); results unaffected —
    row order is the only thing that changes."""
    n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        df = df.repartition(n)
    return df


def _docs_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # every consumer runs the mapInPandas structural parse downstream —
    # the heaviest per-row work in the repo — so the spread always pays
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    return d.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.concat(
            F.lit("# Doc "),
            F.col("doc_id").cast("string"),
            F.lit("\n\n\n"),
            F.col("text"),
            F.lit(_PAYLOAD_SUFFIX),
        ).alias("text"),
    )


def q_extract_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    turns = pipeline.extract_turns(_docs_as_transcripts(spark, sf_dir))
    return turns.select("conv_id", "turn_idx", "markdown")


SQL_EXTRACT_MARKDOWN = """
WITH norm AS (
  SELECT 'doc-' || doc_id AS conv_id, 0 AS turn_idx, doc_id,
         '# Doc ' || doc_id || '\n\n' || text ||
         '\n\n![img-1.jpeg](img-1.jpeg)' AS md
  FROM documents
), p2 AS (
  SELECT conv_id, turn_idx, doc_id,
         replace(md, '![img-1.jpeg](img-1.jpeg)',
           '![img-1.jpeg](img-1.jpeg)' ||
           '\n\n> \U0001F4C4 Image OCR Result:\n\n```json\n' ||
           '{\n  "unstructured_ocr": "deterministic OCR for img-1.jpeg at turn 0 of doc-'
           || doc_id || '"\n}' || '\n```') AS md
  FROM norm
)
SELECT conv_id, turn_idx,
       replace(md, '![img-1.jpeg](img-1.jpeg)',
               '![img-1.jpeg](images_doc-' || doc_id ||
               '/page_1_img_1.png)') AS markdown
FROM p2
"""


def q_extract_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    turns = pipeline.extract_turns(_docs_as_transcripts(spark, sf_dir))
    return pipeline.extract_images(turns)


SQL_EXTRACT_IMAGES = """
SELECT 'doc-' || doc_id AS conv_id, 0 AS turn_idx, 1 AS img_idx,
       'img-1.jpeg' AS img_id,
       'images_doc-' || doc_id || '/page_1_img_1.png' AS path
FROM documents
"""


def q_extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span/block table with char offsets.  The DuckDB twin
    (SQL_EXTRACT_SPANS) re-derives the segmentation from first
    principles: split the oracle markdown into lines, window-sum char
    offsets and fence parity, group on blank-line separators — so the
    offset arithmetic of the vectorized NumPy path is value-verified,
    including the ``text = markdown[start:end]`` slice invariant."""
    turns = pipeline.extract_turns(_docs_as_transcripts(spark, sf_dir))
    return pipeline.extract_spans(turns)


# Generic fence-aware line-arithmetic segmentation over the markdown
# produced by SQL_EXTRACT_MARKDOWN (not a hand-coded block list).
SQL_EXTRACT_SPANS = (
    "WITH md AS (" + SQL_EXTRACT_MARKDOWN + "),\n"
    r"""
ls AS (
  SELECT conv_id, turn_idx, markdown,
         regexp_split_to_array(markdown, chr(10)) AS lines
  FROM md
),
ln AS (
  SELECT conv_id, turn_idx, markdown, i AS line_no,
         lines[i] AS line, length(lines[i]) AS llen
  FROM ls, UNNEST(range(1, len(lines) + 1)) r(i)
),
off AS (
  SELECT *,
    coalesce(sum(llen + 1) OVER w, 0) AS start,
    coalesce(sum(CASE WHEN starts_with(line, '```') THEN 1 ELSE 0 END)
             OVER w, 0) AS fence_before,
    (trim(line, ' ' || chr(9)) = '') AS blank
  FROM ln
  WINDOW w AS (PARTITION BY conv_id, turn_idx ORDER BY line_no
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
sep AS (SELECT *, (blank AND fence_before % 2 = 0) AS is_sep FROM off),
blk AS (
  SELECT *,
    coalesce(sum(CASE WHEN is_sep THEN 1 ELSE 0 END) OVER w, 0) AS block_ord
  FROM sep
  WINDOW w AS (PARTITION BY conv_id, turn_idx ORDER BY line_no
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
grouped AS (
  SELECT conv_id, turn_idx, block_ord,
         any_value(markdown) AS markdown,
         min(start) AS bstart, max(start + llen) AS bend,
         arg_min(line, line_no) AS first_line
  FROM blk WHERE NOT is_sep
  GROUP BY conv_id, turn_idx, block_ord
)
SELECT conv_id, turn_idx,
       (row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY block_ord)
        - 1)::INT AS block_idx,
       CASE WHEN regexp_matches(first_line, '^#{1,6} ') THEN 'heading'
            WHEN starts_with(first_line, '```') THEN 'code'
            WHEN starts_with(first_line, '|') THEN 'table'
            WHEN starts_with(first_line, '- ')
              OR regexp_matches(first_line, '^[0-9]+\. ') THEN 'list'
            WHEN starts_with(first_line, '> ') THEN 'blockquote'
            WHEN starts_with(first_line, '![') THEN 'image'
            ELSE 'para' END AS block_type,
       CASE WHEN regexp_matches(first_line, '^#{1,6} ')
            THEN length(regexp_extract(first_line, '^(#+) ', 1))::INT
            ELSE 0 END AS level,
       bstart::INT AS start, bend::INT AS "end",
       substr(markdown, bstart::INT + 1, (bend - bstart)::INT) AS text
FROM grouped
"""
)


# --------------------------------------------------- base64 image payloads
def _docs_with_b64_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turns carrying the reference's Image shape: array<struct<id,
    image_base64>> with data-URL payloads (mistralocr_app.py:88)."""
    d = _t(spark, sf_dir, "documents")
    # Spark's base64() emits MIME line-wrapped output (CRLF every 76
    # chars); data URLs are single-line — strip the wrapping.
    b64 = lambda payload: F.regexp_replace(
        F.base64(payload.cast("binary")), r"[\r\n]", ""
    )
    mk = lambda img_id, payload: F.struct(
        F.lit(img_id).alias("id"),
        F.concat(F.lit("data:image/jpeg;base64,"), b64(payload)).alias(
            "image_base64"
        ),
    )
    return d.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.array(
            mk("img-a.jpeg", F.col("text")), mk("img-b.jpeg", F.col("source"))
        ).alias("images_b64"),
    )


def q_images_b64_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 decode path: data URL → binary payload (verified as hex so the
    DuckDB oracle can compare bytes exactly)."""
    imgs = assemble.decode_image_payloads(
        _docs_with_b64_images(spark, sf_dir)
    )
    return imgs.select(
        "conv_id",
        "turn_idx",
        F.col("img_idx").cast("long").alias("img_idx"),
        "img_id",
        F.hex("payload").alias("payload_hex"),
        F.col("n_bytes").cast("long").alias("n_bytes"),
    )


SQL_IMAGES_B64_DECODE = """
WITH src AS (
  SELECT 'doc-' || doc_id AS conv_id, 0 AS turn_idx, i AS img_idx,
         CASE i WHEN 1 THEN 'img-a.jpeg' ELSE 'img-b.jpeg' END AS img_id,
         'data:image/jpeg;base64,' ||
           to_base64(encode(CASE i WHEN 1 THEN text ELSE source END)) AS b64
  FROM documents, UNNEST(range(1, 3)) r(i)
)
SELECT conv_id, turn_idx, img_idx, img_id,
       hex(from_base64(str_split(b64, ',')[-1])) AS payload_hex,
       octet_length(from_base64(str_split(b64, ',')[-1]))::BIGINT AS n_bytes
FROM src
"""


def q_inline_images_b64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 end-to-end with real base64 payloads: ``![id](id)`` →
    ``![id](data:image/jpeg;base64,...)`` (replace_images_in_markdown,
    mistralocr_app.py:76-82, fed by the :107 data-URL grammar)."""
    src = _docs_with_b64_images(spark, sf_dir)
    md = F.concat(
        F.lit("![img-a.jpeg](img-a.jpeg)\n\nbody\n\n![img-b.jpeg](img-b.jpeg)")
    )
    inline = assemble.replace_images_inline(
        md,
        F.transform(
            "images_b64",
            lambda s: F.struct(
                s["id"].alias("id"), s["image_base64"].alias("payload")
            ),
        ),
    )
    return src.select("conv_id", inline.alias("inlined"))


SQL_INLINE_IMAGES_B64 = """
SELECT 'doc-' || doc_id AS conv_id,
       '![img-a.jpeg](data:image/jpeg;base64,' || to_base64(encode(text)) ||
       ')' || chr(10) || chr(10) || 'body' || chr(10) || chr(10) ||
       '![img-b.jpeg](data:image/jpeg;base64,' || to_base64(encode(source)) ||
       ')' AS inlined
FROM documents
"""


def q_structured_ocr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 typed-schema analog: StructuredOCR struct (file_name, topics,
    languages, ocr_contents — mistralocr_app.py:54-58) derived from the
    parsed block structure; flattened here for the oracle compare."""
    turns = pipeline.extract_turns(_docs_as_transcripts(spark, sf_dir))
    spans = pipeline.extract_spans(turns)
    s = assemble.structured_ocr(turns, spans)
    return s.select(
        "conv_id",
        "turn_idx",
        F.col("structured_ocr.file_name").alias("file_name"),
        F.array_join("structured_ocr.topics", ",").alias("topics_csv"),
        F.col("structured_ocr.languages").alias("languages"),
        F.col("structured_ocr.ocr_contents").alias("ocr_contents"),
    )


def _sql_structured_ocr() -> str:
    return (
        "WITH md AS (" + SQL_EXTRACT_MARKDOWN + "),\n"
        "sp AS (" + SQL_EXTRACT_SPANS + "),\n"
        r"""
topics AS (
  SELECT conv_id, turn_idx,
         string_agg(DISTINCT block_type, ',' ORDER BY block_type) AS topics_csv
  FROM sp GROUP BY conv_id, turn_idx
)
SELECT m.conv_id, m.turn_idx,
       replace(m.conv_id, ' ', '_') || '_turn_' || m.turn_idx || '.md'
         AS file_name,
       coalesce(t.topics_csv, '') AS topics_csv,
       CASE WHEN regexp_matches(m.markdown, '[一-鿿]') THEN 'zh'
            WHEN contains(' ' || lower(m.markdown) || ' ', ' the ')
              OR contains(' ' || lower(m.markdown) || ' ', ' and ')
              OR contains(' ' || lower(m.markdown) || ' ', ' is ') THEN 'en'
            WHEN contains(' ' || lower(m.markdown) || ' ', ' el ')
              OR contains(' ' || lower(m.markdown) || ' ', ' la ')
              OR contains(' ' || lower(m.markdown) || ' ', ' de ') THEN 'es'
            ELSE 'other' END AS languages,
       '{' || chr(10) || '  "unstructured_ocr": "deterministic OCR for ' ||
       'img-1.jpeg at turn 0 of ' || m.conv_id || '"' || chr(10) || '}'
         AS ocr_contents
FROM md m LEFT JOIN topics t USING (conv_id, turn_idx)
"""
    )


SQL_STRUCTURED_OCR = _sql_structured_ocr()


# ------------------------------------------------------- HTML parse path
# Deterministic HTML payload exercising every converter branch: boilerplate
# strip (nav/script/comment/cookie-div), headings, lists, tables,
# blockquotes, paragraphs, all inline conversions, and an image placeholder
# that then flows through P2 (OCR insert) + P3 (link rewrite).  DuckDB can
# construct the expected markdown by string concat, so the HTML converter
# (engine/core/parser.py::extract_html_series; reference semantics
# mistralocr_app.py:84-99) sits under the hard correctness signal.
def _docs_as_html_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    img = F.concat(F.lit("img-"), (F.col("doc_id") % 3).cast("string"),
                   F.lit(".jpeg"))
    html = F.concat(
        F.lit('<nav><a href="/">home</a> | <a href="/about">about</a></nav>'),
        F.lit("<h1>Doc "), sid, F.lit("</h1>"),
        F.lit("<script>var tracking = 1;</script>"),
        F.lit("<p>"), F.col("text"), F.lit("</p>"),
        F.lit("<!-- build 17 -->"),
        F.lit("<ul><li>lang: "), F.col("lang"),
        F.lit("</li><li>source: "), F.col("source"), F.lit("</li></ul>"),
        F.lit("<table><tr><th>k</th><th>v</th></tr><tr><td>n</td><td>"),
        sid, F.lit("</td></tr></table>"),
        F.lit("<blockquote>from "), F.col("source"), F.lit("</blockquote>"),
        F.lit("<p><b>bold</b> and <i>italic</i> and <code>x="), sid,
        F.lit('</code> and <a href="https://ex.org/'), sid,
        F.lit('">doc '), sid, F.lit("</a>.</p>"),
        F.lit('<div class="cookie-banner x">Accept cookies</div>'),
        F.lit('<img src="'), img, F.lit('" alt="'), img, F.lit('"/>'),
    )
    return d.select(
        F.concat(F.lit("doc-"), sid).alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        html.alias("text"),
    )


def q_extract_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    turns = pipeline.extract_turns(_docs_as_html_transcripts(spark, sf_dir))
    return turns.select("conv_id", "turn_idx", "markdown")


SQL_EXTRACT_HTML = """
WITH b AS (
  SELECT doc_id, 'doc-' || doc_id AS conv_id, text, lang, source,
         'img-' || (doc_id % 3) || '.jpeg' AS img
  FROM documents
)
SELECT conv_id, 0 AS turn_idx,
  '# Doc ' || doc_id || chr(10) || chr(10) ||
  text || chr(10) || chr(10) ||
  '- lang: ' || lang || chr(10) || '- source: ' || source
    || chr(10) || chr(10) ||
  '| k | v |' || chr(10) || '| --- | --- |' || chr(10) ||
  '| n | ' || doc_id || ' |' || chr(10) || chr(10) ||
  '> from ' || source || chr(10) || chr(10) ||
  '**bold** and *italic* and `x=' || doc_id ||
  '` and [doc ' || doc_id || '](https://ex.org/' || doc_id || ').'
    || chr(10) || chr(10) ||
  '![' || img || '](images_doc-' || doc_id || '/page_1_img_1.png)' ||
  '\n\n> \U0001F4C4 Image OCR Result:\n\n```json\n' ||
  '{\n  "unstructured_ocr": "deterministic OCR for ' || img ||
  ' at turn 0 of doc-' || doc_id || '"\n}' || '\n```' AS markdown
FROM b
"""


def q_doc_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        F.col("source").alias("conv_id"),
        F.col("doc_id").alias("turn_idx"),
        F.col("text").alias("markdown"),
    )
    out = assemble.assemble_docs(d, chunk=1 << 20)
    return out.select(
        F.col("conv_id").alias("source"), F.col("markdown").alias("doc_markdown")
    )


SQL_DOC_ASSEMBLY = """
SELECT source,
       string_agg(text, '\n\n---\n\n' ORDER BY doc_id) AS doc_markdown
FROM documents GROUP BY source
"""


def q_doc_assembly_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        F.col("source").alias("conv_id"),
        F.col("doc_id").alias("turn_idx"),
        F.col("text").alias("markdown"),
    )
    # small chunk forces the 2-phase (salted) path; result must be identical
    out = assemble.assemble_docs(d, chunk=17)
    return out.select(
        F.col("conv_id").alias("source"), F.col("markdown").alias("doc_markdown")
    )


def q_doc_assembly_display(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 display-path join "\\n\\n" (mistralocr_app.py:90)."""
    d = _t(spark, sf_dir, "documents").select(
        F.col("source").alias("conv_id"),
        F.col("doc_id").alias("turn_idx"),
        F.col("text").alias("markdown"),
    )
    out = assemble.assemble_docs(d, chunk=1 << 20, sep="\n\n")
    return out.select(
        F.col("conv_id").alias("source"), F.col("markdown").alias("doc_markdown")
    )


SQL_DOC_ASSEMBLY_DISPLAY = """
SELECT source,
       string_agg(text, chr(10) || chr(10) ORDER BY doc_id) AS doc_markdown
FROM documents GROUP BY source
"""


def q_translate_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 error-channel semantics (mistralocr_app.py:211-216)."""
    from engine.spark import translate

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.col("text").alias("markdown"),
    )
    out = translate.translate_turns(d, fail_when=F.col("doc_id") % 7 == 0)
    return out.select("doc_id", "translated")


SQL_TRANSLATE_MARKDOWN = """
SELECT doc_id,
  CASE WHEN doc_id % 7 = 0
       THEN '--- ERROR: Translation Failed for Page 1 ---' || chr(10) || chr(10) || text
       ELSE '> [translated zh-TW]' || chr(10) || chr(10) || text
  END AS translated
FROM documents
"""


def q_translate_markdown_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 via the PRODUCTION plug point (translate_turns_udf — the
    Arrow-batched pandas UDF a real deployment wraps a remote client in,
    engine/spark/translate.py:70+), not the Catalyst stand-in.  The
    deterministic translator raises on doc_id % 7 == 0 (parsed from the
    page prefix), exercising the per-row failure-isolation retry path
    (mistralocr_app.py:211-216) under the hard oracle signal."""
    import pandas as pd

    from engine.spark import translate

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.lit(0).alias("turn_idx"),
        F.concat(
            F.lit("doc-"), F.col("doc_id").cast("string"), F.lit("\n\n"),
            F.col("text"),
        ).alias("markdown"),
    )

    def translator(md: pd.Series) -> pd.Series:
        ids = md.str.extract(r"^doc-(\d+)", expand=False).astype("int64")
        if (ids % 7 == 0).any():
            raise RuntimeError("simulated remote translation failure")
        return "> [translated zh-TW]\n\n" + md

    out = translate.translate_turns_udf(d, translator=translator)
    return out.select("doc_id", "translated")


SQL_TRANSLATE_MARKDOWN_UDF = """
SELECT doc_id,
  CASE WHEN doc_id % 7 = 0
       THEN '--- ERROR: Translation Failed for Page 1 ---' || chr(10) || chr(10)
            || 'doc-' || doc_id || chr(10) || chr(10) || text
       ELSE '> [translated zh-TW]' || chr(10) || chr(10)
            || 'doc-' || doc_id || chr(10) || chr(10) || text
  END AS translated
FROM documents
"""


def q_ocr_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 regroup (mistralocr_app.py:513-517) under the oracle: the
    per-turn map<img_id, ocr_json> from assemble.ocr_map_table exploded
    back to rows.  The images array gets a planted duplicate id
    ([img-1, img-2, img-1]) so the python-dict LAST_WIN key collapse
    (mistralocr_app.py:641) is value-checked — the map must carry
    exactly one entry per DISTINCT id, never error or duplicate."""
    # LAST_WIN is runtime-settable; the engine session sets it at build
    # time, but the driver's vanilla session may not
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    turns = pipeline.extract_turns(_docs_as_transcripts(spark, sf_dir))
    t = turns.withColumn(
        "images",
        F.concat(
            F.col("images"), F.array(F.lit("img-2.jpeg")), F.col("images")
        ),
    )
    m = assemble.ocr_map_table(t)
    return m.select(
        "conv_id", "turn_idx", F.explode("ocr_map").alias("img_id", "ocr_json")
    )


SQL_OCR_MAP = """
WITH imgs AS (
  SELECT 'doc-' || doc_id AS conv_id, 0 AS turn_idx, doc_id, img_id
  FROM documents, UNNEST(['img-1.jpeg', 'img-2.jpeg']) t(img_id)
)
SELECT conv_id, turn_idx, img_id,
       '{\n  "unstructured_ocr": "deterministic OCR for ' || img_id ||
       ' at turn 0 of doc-' || doc_id || '"\n}' AS ocr_json
FROM imgs
"""


def q_placeholder_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P3 semantics (mistralocr_app.py:76-82, 101-122) as column exprs."""
    d = _t(spark, sf_dir, "documents")
    img = F.concat(F.lit("img-"), (F.col("doc_id") % 3).cast("string"),
                   F.lit(".jpeg"))
    ph = F.concat(F.lit("!["), img, F.lit("]("), img, F.lit(")"))
    md = F.concat(ph, F.lit("\n\n"), F.col("text"))
    path = F.concat(
        F.lit("images_src/page_"), (F.col("doc_id") + 1).cast("string"),
        F.lit("_img_1.png"),
    )
    out = F.replace(md, ph, F.concat(F.lit("!["), img, F.lit("]("), path,
                                     F.lit(")")))
    return d.select("doc_id", out.alias("rewritten"))


SQL_PLACEHOLDER_REWRITE = """
WITH b AS (
  SELECT doc_id, 'img-' || (doc_id % 3) || '.jpeg' AS img, text FROM documents
)
SELECT doc_id,
       replace('![' || img || '](' || img || ')' || '\n\n' || text,
               '![' || img || '](' || img || ')',
               '![' || img || '](images_src/page_' || (doc_id + 1) ||
               '_img_1.png)') AS rewritten
FROM b
"""


def q_ocr_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 semantics (mistralocr_app.py:92-99) as column exprs."""
    d = _t(spark, sf_dir, "documents")
    img = F.lit("img-0.jpeg")
    ph = F.concat(F.lit("!["), img, F.lit("]("), img, F.lit(")"))
    md = F.concat(ph, F.lit("\n\n"), F.col("text"))
    ocr = assemble.ocr_json_col(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")), F.lit(0), img
    )
    out = F.replace(
        md, ph,
        F.concat(ph, F.lit(spec.OCR_BLOCK_PREFIX), ocr,
                 F.lit(spec.OCR_BLOCK_SUFFIX)),
    )
    return d.select("doc_id", out.alias("with_ocr"))


SQL_OCR_INSERT = """
SELECT doc_id,
  replace('![img-0.jpeg](img-0.jpeg)' || '\n\n' || text,
          '![img-0.jpeg](img-0.jpeg)',
          '![img-0.jpeg](img-0.jpeg)' ||
          '\n\n> \U0001F4C4 Image OCR Result:\n\n```json\n' ||
          '{\n  "unstructured_ocr": "deterministic OCR for img-0.jpeg at turn 0 of doc-'
          || doc_id || '"\n}' || '\n```') AS with_ocr
FROM documents
"""


def q_fence_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fence-strip semantics of mistralocr_app.py:386-390."""
    d = _t(spark, sf_dir, "documents")
    d = d.withColumn(
        "s",
        F.when(F.col("doc_id") % 3 == 0, F.col("text")).otherwise(
            F.concat(F.lit("```json\n"), F.col("text"), F.lit("\n```"))
        ),
    )
    d = d.withColumn(
        "s1",
        F.when(F.col("s").startswith("```json"), F.expr("substring(s, 8)"))
        .otherwise(F.col("s")),
    )
    d = d.withColumn(
        "s2",
        F.when(
            F.col("s1").endswith("```"),
            F.expr("substring(s1, 1, length(s1) - 3)"),
        ).otherwise(F.col("s1")),
    )
    return d.select(
        "doc_id", F.expr("trim(BOTH ' \n\t' FROM s2)").alias("stripped")
    )


SQL_FENCE_STRIP = """
WITH b AS (
  SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN text
                      ELSE '```json' || chr(10) || text || chr(10) || '```'
                 END AS s
  FROM documents
), s1 AS (
  SELECT doc_id,
         CASE WHEN starts_with(s, '```json') THEN substr(s, 8) ELSE s END AS s1
  FROM b
), s2 AS (
  SELECT doc_id,
         CASE WHEN ends_with(s1, '```')
              THEN substr(s1, 1, length(s1) - 3) ELSE s1 END AS s2
  FROM s1
)
SELECT doc_id, trim(s2, ' ' || chr(10) || chr(9)) AS stripped FROM s2
"""


def q_sanitize_stem(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        assemble.stem_col(
            F.concat(F.col("source"), F.lit(" "), F.col("lang"))
        ).alias("stem"),
    )


SQL_SANITIZE_STEM = """
SELECT doc_id, replace(source || ' ' || lang, ' ', '_') AS stem FROM documents
"""


# ---------------------------------------------------------------- relational
def q_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(18,4)")
    disc = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    g = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec(F.col("l_quantity"))).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(dec(F.col("l_extendedprice"))).cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum(disc).cast("double"), 2).alias("sum_disc_price"),
            F.round(F.sum(dec(F.col("l_quantity"))).cast("double") / F.count("*"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )
    return g


SQL_Q1_PRICING = """
SELECT l_returnflag, l_linestatus,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_base_price,
  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_disc_price,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_qty,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned semi-join (joins.bloom_filter_semi_join): lineitem
    rows belonging to high-value orders (o_totalprice > 400000), with a
    broadcast bloom bitmap dropping non-matching fact rows inside the
    scan's codegen BEFORE the semi-join shuffle.  The oracle is the
    plain IN-subquery semi-join — a hash match proves the bloom is
    correctness-transparent (false positives refined away, zero false
    negatives)."""
    li = _t(spark, sf_dir, "lineitem")
    hi = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    dec = lambda c: c.cast("decimal(18,4)")
    return (
        joins.bloom_filter_semi_join(
            li, hi, key_col="l_orderkey", dim_key_col="o_orderkey"
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(
                    dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                ).cast("double"),
                2,
            ).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


SQL_BLOOM_SEMI_JOIN = """
SELECT l_returnflag, count(*) AS n_items,
  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    dec = lambda col: F.col(col).cast("decimal(18,4)")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(dec("o_totalprice")).cast("double"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
            F.countDistinct("c_custkey").alias("n_customers"),
        )
    )


SQL_REVENUE_BY_NATION = """
SELECT n_name,
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
  count(*) AS n_orders,
  count(DISTINCT c_custkey) AS n_customers
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog (adapted to this schema): unshipped revenue of
    BUILDING-segment orders placed before the cutoff, top 10.  Plan
    shape that matters at scale: the segment filter prunes customer
    BEFORE the join (semi-join reduction), the orders×lineitem join is
    the only big shuffle, and the top-10 is a global sort of the small
    aggregated result — never of the fact table."""
    cutoff = "1998-01-01"
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(cutoff)
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(cutoff)
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    dec = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    g = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(dec.cast("decimal(18,4)")).cast("double"), 2
            ).alias("revenue")
        )
    )
    return g.orderBy(
        F.col("revenue").desc(), F.col("o_orderkey")
    ).limit(10)


SQL_Q3_SHIPPING_PRIORITY = """
SELECT o_orderkey, o_orderdate,
  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
             AS DOUBLE), 2) AS revenue
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q_orders_no_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey").distinct()
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_anti").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


SQL_ORDERS_NO_LINEITEMS = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
"""


def q_top3_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


SQL_TOP3_ORDERS = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 2).alias("sum_value"),
        )
    )


SQL_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS hour, event_type,
  count(*) AS n_events,
  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_running_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double"),
            2,
        ).alias("running_value"),
    )


SQL_RUNNING_USER_VALUE = """
SELECT user_id, event_id,
  round(CAST(sum(CAST(value AS DECIMAL(18,4)))
        OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
  AS running_value
FROM events WHERE user_id < 40
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trades-and-quotes as-of join over the events table: "quotes" =
    every 17th event, "trades" = the rest; each trade gets the latest
    preceding same-user quote.  The DuckDB oracle uses its NATIVE ASOF
    JOIN — a different algorithm agreeing value-exactly with the
    union+window re-expression (engine/spark/joins.py)."""
    e = _t(spark, sf_dir, "events")
    # keep one quote per (user_id, ts): DuckDB's native ASOF JOIN has no
    # tie-break among right rows at the same timestamp, so both engines
    # de-tie identically up front (lowest quote_id wins) — removes the
    # one latent cross-engine ambiguity from this comparison
    wq = Window.partitionBy("user_id", "ts").orderBy("event_id")
    quotes = (
        e.filter(F.col("event_id") % 17 == 0)
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            "ts",
            F.col("event_id").alias("quote_id"),
            F.col("value").alias("quote_value"),
        )
    )
    trades = e.filter(F.col("event_id") % 17 != 0).select(
        "event_id", "user_id", "ts", "value"
    )
    out = joins.asof_join(trades, quotes, key="user_id", ts_col="ts")
    return out.select(
        "event_id", "user_id", "ts", "value",
        "asof_ts", "asof_quote_id", "asof_quote_value",
    )


SQL_ASOF_JOIN = """
WITH quotes AS (
  SELECT user_id, ts, event_id AS quote_id, value AS quote_value
  FROM events WHERE event_id % 17 = 0
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) = 1
),
trades AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_id % 17 != 0
)
SELECT t.event_id, t.user_id, t.ts, t.value,
       q.ts AS asof_ts, q.quote_id AS asof_quote_id,
       q.quote_value AS asof_quote_value
FROM trades t
ASOF LEFT JOIN quotes q ON t.user_id = q.user_id AND t.ts >= q.ts
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment: 24-hour windows opened by every 97th event,
    aggregate same-user events inside each window.  Spark side is the
    bucketed equi-join (engine/spark/joins.py); the DuckDB oracle is a
    plain inequality join — algorithm-independent agreement."""
    e = _t(spark, sf_dir, "events")
    iv = e.filter(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("window_id"),
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 24 HOURS")).alias("w_end"),
    )
    pts = e.select("user_id", "ts", "value")
    matched = joins.range_join_bucketed(
        pts, iv, key="user_id", ts_col="ts",
        start_col="w_start", end_col="w_end", bucket_seconds=3600,
    )
    return matched.groupBy("window_id").agg(
        F.count("*").alias("n_events"),
        F.round(
            F.sum(F.col("p.value").cast("decimal(18,4)")).cast("double"), 2
        ).alias("sum_value"),
    )


SQL_RANGE_JOIN = """
WITH iv AS (
  SELECT event_id AS window_id, user_id, ts AS w_start,
         ts + INTERVAL 24 HOUR AS w_end
  FROM events WHERE event_id % 97 = 0
)
SELECT iv.window_id, count(*) AS n_events,
       round(CAST(sum(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE), 2)
         AS sum_value
FROM iv JOIN events e
  ON e.user_id = iv.user_id AND e.ts >= iv.w_start AND e.ts <= iv.w_end
GROUP BY iv.window_id
"""


# ----------------------------------------------------- text / training-data
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return d.groupBy("lang").agg(
        F.sum(etext.ws_token_count(t).cast("long")).alias("total_tokens"),
        F.sum(etext.bpe_token_count(t).cast("long")).alias("total_bpe_tokens"),
        F.round(F.avg(etext.ws_token_count(t)), 4).alias("avg_tokens"),
        F.count("*").alias("n_docs"),
    )


SQL_TOKEN_STATS = r"""
WITH b AS (
  SELECT lang,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+')) END AS n_tok,
    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0b\f\r]')) AS n_bpe
  FROM documents
)
SELECT lang, sum(n_tok)::BIGINT AS total_tokens,
       sum(n_bpe)::BIGINT AS total_bpe_tokens,
       round(avg(n_tok), 4) AS avg_tokens, count(*) AS n_docs
FROM b GROUP BY lang
"""


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    q = etext.quality_frame(d)
    return q.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        "alpha_ratio",
        "punct_ratio",
        "stopword_ratio",
        "lang_pred",
        "fingerprint",
    )


SQL_QUALITY_SCORES = r"""
WITH b AS (
  SELECT doc_id, text, length(text) AS n_chars,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+')) END AS n_tokens,
    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0b\f\r]')) AS n_bpe_tokens
  FROM documents
)
SELECT doc_id, n_chars, n_tokens, n_bpe_tokens,
  CASE WHEN n_chars = 0 THEN 0.0
       ELSE round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / n_chars, 4) END AS alpha_ratio,
  CASE WHEN n_chars = 0 THEN 0.0
       ELSE round(length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]', '', 'g'))::DOUBLE / n_chars, 4) END AS punct_ratio,
  CASE WHEN n_tokens = 0 THEN 0.0
       ELSE round(len(list_filter(regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+'),
                   x -> x IN ('the','and','of','to','a','in','is','it','for','on')))::DOUBLE / n_tokens, 4) END AS stopword_ratio,
  CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
       WHEN contains(' ' || lower(text) || ' ', ' the ')
         OR contains(' ' || lower(text) || ' ', ' and ')
         OR contains(' ' || lower(text) || ' ', ' is ') THEN 'en'
       WHEN contains(' ' || lower(text) || ' ', ' el ')
         OR contains(' ' || lower(text) || ' ', ' la ')
         OR contains(' ' || lower(text) || ' ', ' de ') THEN 'es'
       ELSE 'other' END AS lang_pred,
  md5(lower(regexp_replace(text, '[ \t\n\x0b\f\r]+', ' ', 'g'))) AS fingerprint
FROM b
"""


# Portable 60-bit hash (engine/spark/dedup.portable_hash60 twin).
_H60 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


def q_span_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-level boilerplate classification (link-density + length
    heuristics) over the extracted span table.  The oracle re-derives
    the spans via SQL window functions (SQL_EXTRACT_SPANS) AND the
    density arithmetic — the whole main-content filter is under the
    hard signal."""
    turns = pipeline.extract_turns(_docs_as_transcripts(spark, sf_dir))
    return etext.classify_spans(pipeline.extract_spans(turns))


SQL_SPAN_BOILERPLATE = rf"""
SELECT conv_id, turn_idx, block_idx, block_type,
       length(text) AS n_chars,
       CASE WHEN length(text) = 0 THEN 0.0 ELSE
         round(coalesce(list_sum(list_transform(
                 regexp_extract_all(text, '\[([^\]]*)\]\([^)]*\)', 0),
                 x -> length(x))), 0) / length(text), 4)
       END AS link_density,
       (CASE WHEN length(text) = 0 THEN 0.0 ELSE
          round(coalesce(list_sum(list_transform(
                  regexp_extract_all(text, '\[([^\]]*)\]\([^)]*\)', 0),
                  x -> length(x))), 0) / length(text), 4)
        END >= {etext.BOILER_LINK_DENSITY}
        OR length(text) < {etext.BOILER_MIN_CHARS}) AS is_boilerplate
FROM (
""" + SQL_EXTRACT_SPANS + """
) s
"""


def q_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end main-content extraction: spans -> boilerplate filter ->
    ordered reassembly into clean per-turn markdown.  Oracle: string_agg
    over the SQL-re-derived spans with the same density predicate."""
    turns = pipeline.extract_turns(_docs_as_transcripts(spark, sf_dir))
    return etext.main_content(pipeline.extract_spans(turns))


SQL_MAIN_CONTENT = rf"""
WITH cls AS (
  SELECT conv_id, turn_idx, block_idx, text,
         CASE WHEN length(text) = 0 THEN 0.0 ELSE
           round(coalesce(list_sum(list_transform(
                   regexp_extract_all(text, '\[([^\]]*)\]\([^)]*\)', 0),
                   x -> length(x))), 0) / length(text), 4)
         END AS ld
  FROM (
""" + SQL_EXTRACT_SPANS + f"""
  ) s
)
SELECT conv_id, turn_idx,
       string_agg(text, chr(10) || chr(10) ORDER BY block_idx)
         AS main_markdown,
       count(*) AS n_blocks_kept
FROM cls
WHERE NOT (ld >= {etext.BOILER_LINK_DENSITY}
           OR length(text) < {etext.BOILER_MIN_CHARS})
GROUP BY conv_id, turn_idx
"""


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting (Rabin–Karp fold over
    tokens) next to the md5 whole-document fingerprint.  The fold
    arithmetic (h·BASE + tok mod M) is re-derived by DuckDB's
    list_reduce — order-sensitivity and modular arithmetic both under
    the hard signal."""
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        etext.fingerprint(F.col("text")).alias("fingerprint_md5"),
        etext.rolling_fingerprint(F.col("text")).alias("fingerprint_roll"),
    )


SQL_DOC_FINGERPRINTS = rf"""
WITH norm AS (
  SELECT doc_id,
         trim(lower(regexp_replace(text, '[ \t\n\x0b\f\r]+', ' ', 'g'))) AS t
  FROM documents
)
SELECT doc_id,
       md5(t) AS fingerprint_md5,
       CASE WHEN length(t) = 0 THEN 0 ELSE
         list_reduce(
           list_transform(
             str_split(t, ' '),
             w -> ('0x' || substr(md5(w), 1, 15))::BIGINT % {etext.ROLL_MOD}
           ),
           (h, tok) -> (h * {etext.ROLL_BASE} + tok) % {etext.ROLL_MOD}
         )
       END AS fingerprint_roll
FROM norm
"""


def q_user_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators: purchasers ∩ clickers ∖ error-affected users.
    Spark plans INTERSECT/EXCEPT as LeftSemi/LeftAnti over aggregated
    keys — one shuffle each, no distinct-then-join detour."""
    e = _t(spark, sf_dir, "events")
    u = lambda t: e.filter(F.col("event_type") == t).select("user_id")
    return u("purchase").intersect(u("click")).subtract(u("error"))


SQL_USER_SETOPS = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error'
"""


def q_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (sort + linear interpolation) per event type —
    Spark's `percentile` and DuckDB's `quantile_cont` implement the same
    type-7 quantile, so values agree to 4 dp."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


SQL_VALUE_QUANTILES = """
SELECT event_type, count(*) AS n,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY event_type
"""


def q_value_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION quantiles: mergeable Greenwald–Khanna sketch
    (diagnose.approx_quantiles) — exact ``percentile`` buffers every
    value of a group on one reducer, an OOM per low-cardinality
    event_type at 10^12 rows.  No oracle_sql twin: a sketch result is
    engine-specific (DuckDB's approx_quantile uses t-digest), so the
    driver records the weaker rows-only check here while the
    ``value_quantiles`` exact twin carries the cross-engine value pin
    and tests/test_sampling.py pins this sketch's n/accuracy rank-error
    bound against the exact answer."""
    e = _t(spark, sf_dir, "events")
    return diagnose.approx_quantiles(
        e, "value", "event_type", probs=(0.5, 0.9, 0.99), accuracy=10000
    )


def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (region → nation → grand total) — the
    multi-level OLAP shape; one shuffle, partial aggregation per level,
    NULL indicator rows for the rolled-up levels per ANSI."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast(
                    "double"
                ),
                2,
            ).alias("revenue"),
        )
    )


SQL_REVENUE_ROLLUP = """
SELECT r_name, n_name, count(*) AS n_orders,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2)
         AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash train/val/test split (portable md5-prefix
    bucket) — assignment is a pure projection, value-verified per doc."""
    d = _t(spark, sf_dir, "documents")
    return etext.deterministic_split(d).select("doc_id", "split")


SQL_TRAIN_SPLIT = f"""
SELECT doc_id,
       CASE WHEN b < 90 THEN 'train'
            WHEN b < 95 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         {_H60.format(x="doc_id::VARCHAR")} % 100 AS b
  FROM documents
)
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # plant exact duplicates: shifted copy of every doc
    dd = d.union(d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text"))
    return dedup.exact_dedup(dd)


SQL_DEDUP_EXACT = r"""
WITH dd AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000000, text FROM documents
)
SELECT md5(lower(regexp_replace(text, '[ \t\n\x0b\f\r]+', ' ', 'g'))) AS fp,
       min(doc_id) AS keep_doc_id, count(*) AS dup_count
FROM dd GROUP BY 1
"""


def q_ngram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    pairs = dedup.ngram_jaccard_pairs(d, n=5, min_shared=2)
    return pairs.orderBy(
        F.col("jaccard").desc(), F.col("doc_a"), F.col("doc_b")
    ).limit(50)


SQL_NGRAM_PAIRS = r"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+') AS t
  FROM documents WHERE doc_id < 300
), g AS (
  SELECT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
  FROM d, UNNEST(range(1, greatest(len(t) - 5, 0) + 2)) AS r(i)
), gd AS (
  SELECT DISTINCT doc_id, shingle FROM g
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM gd GROUP BY doc_id
), rare AS (
  -- document-frequency cap (dedup.ngram_jaccard_pairs max_df=10000)
  SELECT shingle FROM gd GROUP BY shingle HAVING count(*) <= 10000
), gj AS (
  SELECT gd.doc_id, gd.shingle FROM gd JOIN rare USING (shingle)
), shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM gj a JOIN gj b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT doc_a, doc_b, shared,
       round(shared::DOUBLE / (sa.n_sh + sb.n_sh - shared), 4) AS jaccard
FROM shared
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
ORDER BY jaccard DESC, doc_a, doc_b LIMIT 50
"""


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _spread(spark, _t(spark, sf_dir, "embeddings"))
    out = similarity.brute_force_topk(e, n_queries=8, k=5)
    return out.withColumn("rank", F.col("rank").cast("long"))


SQL_EMBEDDING_TOPK = """
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id < 8
), scored AS (
  SELECT q.query_id, b.vec_id AS neighbor_id,
         round(list_inner_product(q.qv, b.v) /
               (sqrt(list_inner_product(q.qv, q.qv)) *
                sqrt(list_inner_product(b.v, b.v))), 6) AS cosine_sim
  FROM q JOIN base b ON b.vec_id != q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 5
"""


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH with the portable md5-prefix shingle hash — the full
    signature → band bucket → candidate → estimate pipeline has an exact
    DuckDB twin (SQL_MINHASH_LSH)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select(
        "doc_id", "text"
    )
    dd = d.union(d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text"))
    return dedup.minhash_lsh_pairs(dd, num_perm=32, bands=16).orderBy(
        "doc_a", "doc_b"
    )


# Doubled corpus shared by the dedup oracles: every doc gets an exact
# twin shifted by +1000000, guaranteeing planted candidate pairs.
_SQL_DOUBLED_DOCS = """
  SELECT doc_id, text FROM documents WHERE doc_id < 200
  UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 200
"""

SQL_MINHASH_LSH = rf"""
WITH d AS ({_SQL_DOUBLED_DOCS}),
tk AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+') AS t FROM d
),
g AS (
  SELECT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM tk, UNNEST(range(1, greatest(len(t) - 3, 0) + 2)) r(i)
),
gd AS (SELECT DISTINCT doc_id, shingle FROM g),
code AS (
  SELECT doc_id, {_H60.format(x='shingle')} % 2147483647 AS code FROM gd
),
per AS (
  SELECT doc_id, i AS perm,
         min((((i * 1103515245 + 12345) % 2147483646 + 1) * code
              + (i * 2654435761 + 11) % 2147483647) % 2147483647) AS mh
  FROM code, UNNEST(range(0, 32)) r(i)
  GROUP BY doc_id, i
),
sig AS (SELECT doc_id, list(mh ORDER BY perm) AS sig FROM per GROUP BY doc_id),
banded AS (
  SELECT doc_id, sig, b AS band,
         md5(b || ':' || array_to_string(sig[b*2+1 : b*2+2], '-')) AS bucket
  FROM sig, UNNEST(range(0, 16)) r(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sig AS sig_a, b.sig AS sig_b
  FROM banded a
  JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       round(len(list_filter(range(1, 33), i -> sig_a[i] = sig_b[i])) / 32.0,
             4) AS est_jaccard
FROM cand
"""


def q_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-then-verify with an edit-distance verifier
    (dedup.fuzzy_dup_pairs): MinHash-LSH candidates refined by exact
    Levenshtein ≤ 12.  Planted twins carry a ' zq end' suffix (edit
    distance 7, token-Jaccard ≈ 0.96) so the refine sees real nonzero
    distances; Spark's thresholded levenshtein bails out early, the
    DuckDB twin computes the full distance then filters — values must
    agree exactly."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 150)
        .select("doc_id", "text")
    )
    dd = d.union(
        d.select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zq end")).alias("text"),
        )
    )
    return dedup.fuzzy_dup_pairs(dd, max_dist=12, num_perm=32, bands=16).orderBy(
        "doc_a", "doc_b"
    )


_SQL_EDITED_DOCS = """
  SELECT doc_id, text FROM documents WHERE doc_id < 150
  UNION ALL SELECT doc_id + 1000000 AS doc_id, text || ' zq end' AS text
  FROM documents WHERE doc_id < 150
"""

SQL_FUZZY_PAIRS = rf"""
WITH d AS ({_SQL_EDITED_DOCS}),
tk AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+') AS t FROM d
),
g AS (
  SELECT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
  FROM tk, UNNEST(range(1, greatest(len(t) - 3, 0) + 2)) r(i)
),
gd AS (SELECT DISTINCT doc_id, shingle FROM g),
code AS (
  SELECT doc_id, {_H60.format(x='shingle')} % 2147483647 AS code FROM gd
),
per AS (
  SELECT doc_id, i AS perm,
         min((((i * 1103515245 + 12345) % 2147483646 + 1) * code
              + (i * 2654435761 + 11) % 2147483647) % 2147483647) AS mh
  FROM code, UNNEST(range(0, 32)) r(i)
  GROUP BY doc_id, i
),
sig AS (SELECT doc_id, list(mh ORDER BY perm) AS sig FROM per GROUP BY doc_id),
banded AS (
  SELECT doc_id, b AS band,
         md5(b || ':' || array_to_string(sig[b*2+1 : b*2+2], '-')) AS bucket
  FROM sig, UNNEST(range(0, 16)) r(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b, levenshtein(da.text, db.text) AS edit_dist
FROM cand c
JOIN d da ON da.doc_id = c.doc_a
JOIN d db ON db.doc_id = c.doc_b
WHERE levenshtein(da.text, db.text) <= 12
ORDER BY c.doc_a, c.doc_b
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, portable hash, radius-derived blocking
    (max_hamming=3 → 4 chunks) — exact DuckDB twin in SQL_SIMHASH."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select(
        "doc_id", "text"
    )
    dd = d.union(d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text"))
    return dedup.simhash_pairs(dd, max_hamming=3).orderBy("doc_a", "doc_b")


SQL_SIMHASH = rf"""
WITH d AS ({_SQL_DOUBLED_DOCS}),
tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+')) AS tok
  FROM d
),
th AS (SELECT doc_id, {_H60.format(x='tok')} AS h FROM tok),
votes AS (
  SELECT doc_id, i,
         sum(CASE WHEN (h >> i::INT) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM th, UNNEST(range(0, 60)) r(i)
  GROUP BY doc_id, i
),
sh AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN (1::BIGINT << i::INT) ELSE 0 END)::BIGINT
           AS simhash
  FROM votes GROUP BY doc_id
),
chunks AS (
  SELECT doc_id, simhash, c AS chunk_idx,
         (simhash >> (15 * c)::INT) & 32767 AS chunk
  FROM sh, UNNEST(range(0, 4)) r(c)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM chunks a
JOIN chunks b
  ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def q_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN with portable md5-derived planes —
    bucket assignment, candidate set and re-rank all value-verified by
    SQL_LSH_ANN (same planes, same fold-left dot products)."""
    e = _t(spark, sf_dir, "embeddings")
    # dim=64 in the driver-generated embeddings tables at every scale
    # factor (the oracle SQL hardcodes it too — a dynamic first() lookup
    # would cost an extra Spark job and buy nothing)
    out = similarity.lsh_ann_topk(e, dim=64, n_queries=8, k=5, n_planes=4)
    return out.withColumn("rank", F.col("rank").cast("long"))


# dim=64 in the driver-generated embeddings tables (all scale factors).
SQL_LSH_ANN = f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
planes AS (
  SELECT h,
         list_transform(range(0, 64),
           d -> ({_H60.format(x="h || ':' || d")} % 100000) / 100000.0 - 0.5)
           AS p
  FROM UNNEST(range(0, 4)) r(h)
),
bits AS (
  SELECT vec_id, h,
         CASE WHEN list_reduce(list_transform(range(1, 65), i -> v[i] * p[i]),
                               (a, b) -> a + b) >= 0
              THEN (1::BIGINT << (3 - h)::INT) ELSE 0 END AS term
  FROM base, planes
),
bucketed AS (
  SELECT b.vec_id, b.v, t.bucket
  FROM base b
  JOIN (SELECT vec_id, sum(term)::BIGINT AS bucket FROM bits GROUP BY vec_id) t
    USING (vec_id)
),
q AS (
  SELECT vec_id AS query_id, v AS qv, bucket AS qbucket
  FROM bucketed WHERE vec_id < 8
),
scored AS (
  SELECT q.query_id, b.vec_id AS neighbor_id,
         round(list_inner_product(q.qv, b.v) /
               (sqrt(list_inner_product(q.qv, q.qv)) *
                sqrt(list_inner_product(b.v, b.v))), 6) AS cosine_sim
  FROM q JOIN bucketed b ON b.bucket = q.qbucket AND b.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 5
"""


def q_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic coarse quantizer (seed vectors + one Lloyd
    refinement, 6dp-rounded means), inverted-list equi-join candidates,
    exact cosine re-rank.  The DuckDB twin retrains the same quantizer
    and must match value-exactly."""
    e = _t(spark, sf_dir, "embeddings")
    out = similarity.ivf_topk(
        e, dim=64, n_centroids=8, n_probe=2, n_queries=8, k=5
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


def _dk_dot(a: str, b: str) -> str:
    """Fold-left dot product (matches Spark's F.aggregate order)."""
    return (
        f"list_reduce(list_transform(range(1, 65), i -> {a}[i] * {b}[i]),"
        " (x, y) -> x + y)"
    )


def _dk_cos(a: str, b: str) -> str:
    return (
        f"({_dk_dot(a, b)} / (sqrt({_dk_dot(a, a)}) * sqrt({_dk_dot(b, b)})))"
    )


def _dk_assign(v: str) -> str:
    """Nearest-centroid id over the `cents` list column (struct<cid,c>),
    ties broken by cid — the twin of similarity._argmin_cluster."""
    return (
        "list_sort(list_transform(cents, s -> "
        f"{{'dist': 1.0 - {_dk_cos(v, 's.c')}, 'cid': s.cid}}))[1].cid"
    )


SQL_IVF_ANN = f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
seeds AS (SELECT vec_id AS cid, v AS c FROM base WHERE vec_id < 8),
cl AS (
  SELECT list(struct_pack(cid := cid, c := c) ORDER BY cid) AS cents
  FROM seeds
),
a1 AS (SELECT vec_id, v, {_dk_assign('v')} AS cid FROM base, cl),
dims AS (
  SELECT cid, i AS d, v[i] AS x FROM a1, UNNEST(range(1, 65)) r(i)
),
means AS (SELECT cid, d, round(avg(x), 6) AS m FROM dims GROUP BY cid, d),
cent2 AS (SELECT cid, list(m ORDER BY d) AS c FROM means GROUP BY cid),
cent2b AS (
  SELECT s.cid, coalesce(c2.c, s.c) AS c
  FROM seeds s LEFT JOIN cent2 c2 USING (cid)
),
cl2 AS (
  SELECT list(struct_pack(cid := cid, c := c) ORDER BY cid) AS cents
  FROM cent2b
),
a2 AS (SELECT vec_id, v, {_dk_assign('v')} AS cid FROM base, cl2),
probes AS (
  SELECT vec_id AS query_id, v AS qv,
         unnest(list_transform(
           list_sort(list_transform(cents, s ->
             {{'dist': 1.0 - {_dk_cos('v', 's.c')}, 'cid': s.cid}}))[1:2],
           t -> t.cid)) AS cid
  FROM base, cl2 WHERE vec_id < 8
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         round({_dk_cos('p.qv', 'a.v')}, 6) AS cosine_sim
  FROM probes p JOIN a2 a ON a.cid = p.cid AND a.vec_id != p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 5
"""


def q_ivf_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + int8 inverted lists + exact re-rank
    (similarity.ivf_quantized_topk) — the 10^10-vector serving shape:
    the corpus is scanned only as 1-byte codes, the approximate-score
    shortlist (deterministic: 6 dp round, id tie-break) is re-ranked
    against full precision by an id equi-join.  The DuckDB twin
    retrains the quantizer, re-derives the codes with the identical
    floor(+0.5) arithmetic, and must match value-exactly."""
    e = _spread(spark, _t(spark, sf_dir, "embeddings"))
    out = similarity.ivf_quantized_topk(
        e, dim=64, n_centroids=8, n_probe=2, n_queries=8, k=5, shortlist=20
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


SQL_IVF_QUANTIZED = f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
seeds AS (SELECT vec_id AS cid, v AS c FROM base WHERE vec_id < 8),
cl AS (
  SELECT list(struct_pack(cid := cid, c := c) ORDER BY cid) AS cents
  FROM seeds
),
a1 AS (SELECT vec_id, v, {_dk_assign('v')} AS cid FROM base, cl),
dims AS (
  SELECT cid, i AS d, v[i] AS x FROM a1, UNNEST(range(1, 65)) r(i)
),
means AS (SELECT cid, d, round(avg(x), 6) AS m FROM dims GROUP BY cid, d),
cent2 AS (SELECT cid, list(m ORDER BY d) AS c FROM means GROUP BY cid),
cent2b AS (
  SELECT s.cid, coalesce(c2.c, s.c) AS c
  FROM seeds s LEFT JOIN cent2 c2 USING (cid)
),
cl2 AS (
  SELECT list(struct_pack(cid := cid, c := c) ORDER BY cid) AS cents
  FROM cent2b
),
a2 AS (SELECT vec_id, v, {_dk_assign('v')} AS cid FROM base, cl2),
qz AS (
  SELECT vec_id, cid, v,
         list_min(v)::DOUBLE AS mn, list_max(v)::DOUBLE AS mx
  FROM a2
),
dq AS (
  -- dequantized int8 codes: dv = mn + (code+128)*rng/255 with
  -- code+128 = floor((x-mn)*255/rng + 0.5) — the exact
  -- quantize_embeddings/dequantize_col arithmetic
  SELECT vec_id, cid,
         CASE WHEN mx = mn THEN list_transform(v, x -> mn)
              ELSE list_transform(v, x ->
                mn + floor((x - mn) * 255 / (mx - mn) + 0.5)
                     * (mx - mn) / 255)
         END AS dv
  FROM qz
),
probes AS (
  SELECT vec_id AS query_id, v AS qv,
         unnest(list_transform(
           list_sort(list_transform(cents, s ->
             {{'dist': 1.0 - {_dk_cos('v', 's.c')}, 'cid': s.cid}}))[1:2],
           t -> t.cid)) AS cid
  FROM base, cl2 WHERE vec_id < 8
),
approx AS (
  SELECT p.query_id, p.qv, d.vec_id AS neighbor_id,
         round({_dk_cos('p.qv', 'd.dv')}, 6) AS approx_sim
  FROM probes p JOIN dq d ON d.cid = p.cid AND d.vec_id != p.query_id
),
short AS (
  SELECT query_id, qv, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY approx_sim DESC, neighbor_id) AS arank
  FROM approx
),
rer AS (
  SELECT s.query_id, s.neighbor_id,
         round({_dk_cos('s.qv', 'b.v')}, 6) AS cosine_sim
  FROM short s JOIN base b ON b.vec_id = s.neighbor_id
  WHERE s.arank <= 20
),
ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, neighbor_id) AS rank
  FROM rer
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 5
"""


def q_embedding_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs over a derived corpus with
    deterministic planted near-dups (the driver's embeddings table has
    no organic pairs above cosine 0.52): vec_id < 16 gets a +100000 twin
    shifted by +0.01 per component (cosine ≈ 0.997).  Both engines run
    the identical banded-LSH candidate generation + exact-cosine filter,
    so the pair set is value-verified, not just recall-checked."""
    e = _t(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    planted = base.filter(F.col("vec_id") < 16).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.01)).alias("embedding"),
    )
    corpus = base.unionAll(planted)
    return similarity.cosine_dup_pairs(
        corpus, dim=64, threshold=0.95, n_bands=4, planes_per_band=4
    )


SQL_EMBEDDING_DUPES = f"""
WITH base AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
),
corpus AS (
  SELECT id, v FROM base
  UNION ALL
  SELECT id + 100000, list_transform(v, x -> x + 0.01) FROM base WHERE id < 16
),
planes AS (
  SELECT h,
         list_transform(range(0, 64),
           d -> ({_H60.format(x="h || ':' || d")} % 100000) / 100000.0 - 0.5)
           AS p
  FROM UNNEST(range(0, 16)) r(h)
),
bits AS (
  SELECT id, h,
         CASE WHEN list_reduce(list_transform(range(1, 65), i -> v[i] * p[i]),
                               (a, b) -> a + b) >= 0
              THEN 1 ELSE 0 END AS bit
  FROM corpus, planes
),
buckets AS (
  SELECT id, (h // 4)::INT AS band,
         sum(bit * (1::BIGINT << (3 - (h % 4))::INT))::BIGINT AS bucket
  FROM bits GROUP BY id, (h // 4)::INT
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM buckets a
  JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
),
scored AS (
  SELECT id_a, id_b,
         round({_dk_cos('ca.v', 'cb.v')}, 6) AS cosine_sim
  FROM cand
  JOIN corpus ca ON ca.id = cand.id_a
  JOIN corpus cb ON cb.id = cand.id_b
)
SELECT id_a, id_b, cosine_sim FROM scored WHERE cosine_sim >= 0.95
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (similarity.semantic_dedup): IVF-cluster the corpus,
    drop any vector whose cluster holds a lower-id vector with cosine
    ≥ 0.95 — cluster-partitioned pairwise, never corpus².  Planted +0.01
    twins of vec_id < 16 (cosine ≈ 0.997, same convention as
    embedding_dupes) give the organic-pair-free driver table real dups
    to drop.  The DuckDB twin retrains the identical quantizer and
    applies the identical greedy keep-first rule."""
    e = _t(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    planted = base.filter(F.col("vec_id") < 16).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.01)).alias(
            "embedding"
        ),
    )
    corpus = base.unionAll(planted)
    return similarity.semantic_dedup(
        corpus, dim=64, n_centroids=8, threshold=0.95
    )


SQL_SEMANTIC_DEDUP = f"""
WITH raw AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
),
base AS (
  SELECT id, v FROM raw
  UNION ALL
  SELECT id + 100000, list_transform(v, x -> x + 0.01) FROM raw
  WHERE id < 16
),
seeds AS (SELECT id AS cid, v AS c FROM base WHERE id < 8),
cl AS (
  SELECT list(struct_pack(cid := cid, c := c) ORDER BY cid) AS cents
  FROM seeds
),
a1 AS (SELECT id, v, {_dk_assign('v')} AS cid FROM base, cl),
dims AS (
  SELECT cid, i AS d, v[i] AS x FROM a1, UNNEST(range(1, 65)) r(i)
),
means AS (SELECT cid, d, round(avg(x), 6) AS m FROM dims GROUP BY cid, d),
cent2 AS (SELECT cid, list(m ORDER BY d) AS c FROM means GROUP BY cid),
cent2b AS (
  SELECT s.cid, coalesce(c2.c, s.c) AS c
  FROM seeds s LEFT JOIN cent2 c2 USING (cid)
),
cl2 AS (
  SELECT list(struct_pack(cid := cid, c := c) ORDER BY cid) AS cents
  FROM cent2b
),
a2 AS (SELECT id, v, {_dk_assign('v')} AS cid FROM base, cl2),
dropped AS (
  SELECT DISTINCT b.id
  FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.id < b.id
  WHERE round({_dk_cos('a.v', 'b.v')}, 6) >= 0.95
)
SELECT a2.id, a2.cid, (dropped.id IS NULL) AS keep
FROM a2 LEFT JOIN dropped ON a2.id = dropped.id
"""


def q_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS value trend (diagnose.grouped_regression): slope +
    intercept of value over days-since-1995 from one partial-agg
    shuffle of exact-DECIMAL sufficient statistics — the metric-drift
    detector; never a per-key sort or window.  The DuckDB twin sums
    the same DECIMAL statistics and evaluates the identical
    fixed-order IEEE double formula."""
    ev = _t(spark, sf_dir, "events")
    return diagnose.grouped_regression(
        ev,
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1995-01-01").cast("date")),
        F.col("value"),
    ).orderBy("user_id")


SQL_VALUE_TREND = r"""
WITH base AS (
  SELECT user_id AS key,
         CAST(datediff('day', DATE '1995-01-01', ts::DATE)
              AS DECIMAL(18,6)) AS x,
         CAST(value AS DECIMAL(18,6)) AS y
  FROM events WHERE value IS NOT NULL
),
agg AS (
  SELECT key, count(*) AS n,
         CAST(sum(x) AS DECIMAL(38,6)) AS sx,
         CAST(sum(y) AS DECIMAL(38,6)) AS sy,
         -- widen one operand past 18 digits: DuckDB multiplies two
         -- int64-backed decimals in int64 and overflows; hugeint path
         -- is exact (Spark's (37,12) product is already exact)
         CAST(sum(CAST(x AS DECIMAL(19,6)) * y) AS DECIMAL(38,6)) AS sxy,
         CAST(sum(CAST(x AS DECIMAL(19,6)) * x) AS DECIMAL(38,6)) AS sxx
  FROM base GROUP BY key
),
d AS (
  SELECT key, n,
         n::DOUBLE AS nd, sx::DOUBLE AS sxd, sy::DOUBLE AS syd,
         sxy::DOUBLE AS sxyd, sxx::DOUBLE AS sxxd
  FROM agg WHERE n >= 2
)
SELECT key AS user_id, n,
       round((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd), 6) AS slope,
       round((syd - ((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd))
              * sxd) / nd, 6) AS intercept
FROM d
WHERE (nd * sxxd - sxd * sxd) <> 0.0
ORDER BY user_id
"""


def q_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities (analytics.label_propagation, 3
    synchronous rounds, smallest-label ties) over the same capped user
    co-occurrence graph as triangle_counts.  Spark computes the
    per-node mode as a struct-max partial agg (no per-node window
    sort); the DuckDB twin uses a row_number window — an independent
    algorithm that must land identical labels."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "user_id",
    )
    edges = analytics.cooccurrence_edges(
        ev, ["event_type", "hour"], "user_id", max_group=64
    )
    return analytics.label_propagation(edges, iters=3).orderBy("node")


def _lp_round(prev: str, cur: str) -> str:
    return f"""{cur} AS (
  SELECT l.node, coalesce(m.new_label, l.label) AS label
  FROM {prev} l LEFT JOIN (
    SELECT v AS node, label AS new_label FROM (
      SELECT d.v, l2.label, count(*) AS cnt,
             row_number() OVER (PARTITION BY d.v
                                ORDER BY count(*) DESC, l2.label ASC) AS rn
      FROM directed d JOIN {prev} l2 ON d.u = l2.node
      GROUP BY d.v, l2.label
    ) WHERE rn = 1
  ) m ON l.node = m.node
)"""


SQL_COMMUNITIES = f"""
WITH membership AS (
  SELECT DISTINCT event_type, date_trunc('hour', ts) AS hour, user_id
  FROM events
),
keep AS (
  SELECT event_type, hour FROM membership
  GROUP BY event_type, hour HAVING count(*) <= 64
),
edges AS (
  SELECT DISTINCT a.user_id::BIGINT AS src, b.user_id::BIGINT AS dst
  FROM membership a
  JOIN keep k ON a.event_type = k.event_type AND a.hour = k.hour
  JOIN membership b
    ON a.event_type = b.event_type AND a.hour = b.hour
   AND a.user_id < b.user_id
),
bidir AS (
  SELECT src AS u, dst AS v FROM edges
  UNION ALL SELECT dst, src FROM edges
),
directed AS (
  SELECT u, v FROM bidir
  UNION ALL SELECT DISTINCT u, u FROM bidir
),
r0 AS (SELECT DISTINCT u AS node, u AS label FROM bidir),
{_lp_round('r0', 'r1')},
{_lp_round('r1', 'r2')},
{_lp_round('r2', 'r3')}
SELECT node, label FROM r3 ORDER BY node
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    feats = multimodal.extract_features(multimodal.media_from_documents(d))
    return feats.select(
        "media_id", "kind", F.col("n_bytes").cast("long").alias("n_bytes")
    )


SQL_MULTIMODAL_FEATURES = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       octet_length(encode(text)) AS n_bytes
FROM documents
"""


def q_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL codec path (VERDICT r2 next #6): deterministic synthetic
    PNGs (encoder cycles all five scanline filters) are decoded by the
    pure-stdlib PNG decoder inside the Arrow feature batches.  The
    oracle re-derives width/height AND the decoded-pixel byte sum from
    the generation formula — so header parse, zlib inflate, and all
    de-filter arithmetic sit under the hard cross-engine signal."""
    media = multimodal.png_media_from_documents(_t(spark, sf_dir, "documents"))
    feats = multimodal.extract_features(media)
    return feats.select(
        "media_id", "width", "height",
        F.col("checksum").alias("pixel_sum"),
    )


SQL_PNG_FEATURES = """
SELECT doc_id AS media_id,
       (doc_id % 16 + 1)::INTEGER AS width,
       (doc_id % 12 + 1)::INTEGER AS height,
       list_sum(
         list_transform(
           range((doc_id % 16 + 1) * (doc_id % 12 + 1)),
           i -> (doc_id * 7 + i) % 256
         )
       )::BIGINT AS pixel_sum
FROM documents
"""


def q_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup pairs (multimodal.image_ahash +
    ahash_pairs): REAL PNG decode → all-integer average-hash (block
    mean vs image mean, cross-multiplied — no float decides a bit) →
    SimHash-style banded candidate join → exact hamming refine via
    bit_count(xor) JVM-side.  Fixtures: each ≥8×8 synthetic PNG gets a
    one-pixel-edited variant (media_id + 7000000), so planted pairs sit
    at hamming 0–2; the oracle re-derives every hash from the pixel
    formula and does the all-pairs hamming join."""
    ids = (
        _t(spark, sf_dir, "documents")
        .filter(
            (F.col("doc_id") < 120)
            & (F.col("doc_id") % 16 + 1 >= 8)
            & (F.col("doc_id") % 12 + 1 >= 8)
        )
        .select("doc_id")
    )
    media = multimodal.png_media_from_documents(ids).unionByName(
        multimodal.png_media_from_documents(
            ids, id_offset=7000000, variant_pixel0=255
        )
    )
    hashes = multimodal.image_ahash(media)
    return multimodal.ahash_pairs(hashes, max_hamming=2, bands=8).orderBy(
        "media_a", "media_b"
    )


SQL_IMAGE_DEDUP = """
WITH ids AS (
  SELECT doc_id FROM documents
  WHERE doc_id < 120 AND doc_id % 16 + 1 >= 8 AND doc_id % 12 + 1 >= 8
), imgs AS (
  SELECT doc_id AS media_id, doc_id AS did, 0 AS v FROM ids
  UNION ALL
  SELECT doc_id + 7000000, doc_id, 1 FROM ids
), px AS (
  SELECT media_id,
         (did % 16 + 1) AS w,
         (did % 12 + 1) AS h,
         list_transform(
           range((did % 16 + 1) * (did % 12 + 1)),
           i -> CASE WHEN v = 1 AND i = 0 THEN 255
                     ELSE (did * 7 + i) % 256 END
         ) AS p
  FROM imgs
), bits AS (
  SELECT media_id, b,
         list_sum(list_transform(
           range((b // 8) * h // 8, (b // 8 + 1) * h // 8),
           y -> list_sum(list_transform(
                  range((b % 8) * w // 8, (b % 8 + 1) * w // 8),
                  x -> p[y * w + x + 1]))
         )) AS bs,
         ((b // 8 + 1) * h // 8 - (b // 8) * h // 8)
           * ((b % 8 + 1) * w // 8 - (b % 8) * w // 8) AS bn,
         list_sum(p) AS ts,
         w * h AS tn
  FROM px, UNNEST(range(64)) AS r(b)
), hs AS (
  SELECT media_id,
         string_agg(CASE WHEN bs * tn > ts * bn THEN '1' ELSE '0' END,
                    '' ORDER BY b) AS ahash
  FROM bits GROUP BY media_id
)
SELECT a.media_id AS media_a, b.media_id AS media_b,
       hamming(a.ahash, b.ahash)::BIGINT AS hamming
FROM hs a JOIN hs b ON a.media_id < b.media_id
WHERE hamming(a.ahash, b.ahash) <= 2
ORDER BY media_a, media_b
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling fan-out (row-expanding posexplode +
    binary byte slicing, zero Python) — frame payloads compared as hex."""
    d = _t(spark, sf_dir, "documents")
    frames = multimodal.sample_frames(multimodal.media_from_documents(d))
    return frames.select(
        "media_id",
        "kind",
        "frame_idx",
        "byte_offset",
        F.hex("frame_payload").alias("frame_hex"),
        "frame_bytes",
    )


SQL_FRAME_SAMPLE = """
WITH m AS (
  -- DuckDB substring() has no BLOB overload, so slice in hex space
  -- (2 chars per byte) and compare hex strings with Spark's F.hex.
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
         upper(hex(encode(text))) AS hp,
         octet_length(encode(text)) AS n_bytes
  FROM documents
),
s AS (
  SELECT *,
         CASE WHEN kind = 'video' THEN n_bytes % 8 + 1 ELSE 1 END AS n_frames
  FROM m
),
x AS (
  SELECT media_id, kind, hp, n_bytes,
         (n_bytes // n_frames)::INT AS step, i::INT AS frame_idx
  FROM s, UNNEST(range(0, n_frames)) r(i)
)
SELECT media_id, kind, frame_idx,
       (frame_idx * step)::BIGINT AS byte_offset,
       substring(hp, frame_idx * step * 2 + 1, step * 2) AS frame_hex,
       (length(substring(hp, frame_idx * step * 2 + 1, step * 2)) // 2)::BIGINT
         AS frame_bytes
FROM x
"""


def q_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    th = multimodal.thumbnail(multimodal.media_from_documents(d))
    return th.select(
        "media_id",
        "kind",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.hex("thumb_payload").alias("thumb_hex"),
        "thumb_bytes",
    )


SQL_THUMBNAIL = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
       64::INT AS width, 64::INT AS height,
       substring(upper(hex(encode(text))), 1, 32) AS thumb_hex,
       least(octet_length(encode(text)), 16)::BIGINT AS thumb_bytes
FROM documents
"""


def q_stream_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from engine.spark import streaming

    # the file stream source needs a directory — stage the parquet file
    src = tempfile.mkdtemp(prefix="stream_src_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{src}/part-0.parquet")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    sink = f"stream_counts_{uuid.uuid4().hex[:8]}"
    return streaming.stream_event_window_counts(spark, src, ckpt,
                                                sink_table=sink)


SQL_STREAM_EVENT_COUNTS = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_stream_event_counts_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state production shape (VERDICT r2 next #5): append mode +
    parquet sink — only watermark-closed windows are emitted and state is
    evicted.  Oracle = the batch aggregation restricted to windows whose
    end precedes the final watermark (max event time − 2 h)."""
    import shutil

    from engine.spark import streaming

    src = tempfile.mkdtemp(prefix="stream_ap_src_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{src}/part-0.parquet")
    ckpt = tempfile.mkdtemp(prefix="stream_ap_ckpt_")
    outp = tempfile.mkdtemp(prefix="stream_ap_out_")
    shutil.rmtree(outp)  # the sink wants to create it
    return streaming.stream_event_window_counts_append(spark, src, ckpt, outp)


SQL_STREAM_EVENT_COUNTS_APPEND = """
WITH wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events)
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_value
FROM events GROUP BY 1, 2
HAVING window_start + INTERVAL 1 HOUR <= (SELECT w FROM wm)
"""


def q_stream_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming trending topics (streaming.stream_trending): bounded-
    state windowed counts in append mode; top-3 per closed window
    ranked on the sink read (rank is final exactly when the watermark
    closes the window).  Oracle = batch counts restricted to closed
    windows + the same deterministic rank."""
    import shutil

    from engine.spark import streaming

    src = tempfile.mkdtemp(prefix="stream_tr_src_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{src}/part-0.parquet")
    ckpt = tempfile.mkdtemp(prefix="stream_tr_ckpt_")
    outp = tempfile.mkdtemp(prefix="stream_tr_out_")
    shutil.rmtree(outp)
    return streaming.stream_trending(spark, src, ckpt, outp, k=3)


SQL_STREAM_TRENDING = """
WITH wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events),
counts AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
  HAVING window_start + INTERVAL 1 HOUR <= (SELECT w FROM wm)
),
ranked AS (
  SELECT window_start, event_type, n_events,
         row_number() OVER (PARTITION BY window_start
                            ORDER BY n_events DESC, event_type ASC) AS rank
  FROM counts
)
SELECT window_start, event_type, n_events, rank
FROM ranked WHERE rank <= 3
"""


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (dropDuplicatesWithinWatermark, bounded
    state): emits the distinct (user_id, event_type) key set — the
    surviving row is arrival-order-dependent, the key set is not, so
    the batch DISTINCT oracle matches value-exactly."""
    import shutil

    from engine.spark import streaming

    src = tempfile.mkdtemp(prefix="stream_src_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{src}/part-0.parquet")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    sink = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    return streaming.stream_dedup_keys(spark, src, ckpt, sink_table=sink)


SQL_STREAM_DEDUP = """
SELECT DISTINCT user_id, event_type FROM events
"""


def q_stream_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXTRACTION pipeline on the Structured Streaming path (file
    source → same parse UDF → parquet sink + checkpoint, availableNow).
    The parse is a stateless map, so the streaming result must be
    byte-identical to batch extraction — it shares SQL_EXTRACT_MARKDOWN
    as its oracle, putting the streaming execution path itself under
    the hard correctness signal."""
    import shutil

    from engine.spark import streaming

    src = tempfile.mkdtemp(prefix="stream_x_src_")
    _docs_as_transcripts(spark, sf_dir).write.mode("overwrite").parquet(src)
    ckpt = tempfile.mkdtemp(prefix="stream_x_ckpt_")
    outp = tempfile.mkdtemp(prefix="stream_x_out_")
    shutil.rmtree(outp)  # the sink wants to create it
    streaming.stream_extract_turns(spark, src, ckpt, outp)
    return spark.read.parquet(outp).select("conv_id", "turn_idx", "markdown")


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream range join (trades×quotes, bounded
    state).  Oracle: the equivalent batch inequality join — with the
    whole corpus in one availableNow batch nothing is watermark-dropped,
    so the match set is exact."""
    import shutil

    from engine.spark import streaming

    src = tempfile.mkdtemp(prefix="ssj_src_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{src}/part-0.parquet")
    ckpt = tempfile.mkdtemp(prefix="ssj_ckpt_")
    sink = f"ssj_{uuid.uuid4().hex[:8]}"
    return streaming.stream_stream_join(spark, src, ckpt, sink_table=sink)


SQL_STREAM_STREAM_JOIN = """
SELECT t.event_id AS trade_id, t.user_id AS t_user, t.ts AS t_ts,
       q.event_id AS quote_id, q.ts AS q_ts, q.value AS quote_value
FROM events t JOIN events q
  ON t.event_id % 17 != 0 AND q.event_id % 17 = 0
 AND t.user_id = q.user_id
 AND q.ts BETWEEN t.ts - INTERVAL 1 HOUR AND t.ts
"""


def q_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user event-type count matrix (explicit value list ⇒
    deterministic columns, map-side partial aggregation, one shuffle).
    Oracle: conditional aggregation."""
    e = _t(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    return (
        e.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .na.fill(0, kinds)
    )


SQL_EVENT_TYPE_PIVOT = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click')    AS click,
       count(*) FILTER (WHERE event_type = 'error')    AS error,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'signup')   AS signup,
       count(*) FILTER (WHERE event_type = 'view')     AS view
FROM events GROUP BY user_id
"""


def q_event_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — the inverse of the pivot matrix: the wide per-user
    count matrix back to long (user_id, event_type, n) form via
    DataFrame.unpivot (Spark's Expand-based melt, no join and no UDF —
    one projection over the already-aggregated matrix).  Zero-count
    cells are kept (they are real matrix entries), so melt(pivot(x))
    restricted to observed kinds is total."""
    wide = q_event_type_pivot(spark, sf_dir)
    kinds = ["click", "error", "purchase", "signup", "view"]
    return wide.unpivot(
        "user_id", kinds, "event_type", "n"
    ).select("user_id", "event_type", F.col("n").cast("long").alias("n"))


SQL_EVENT_MELT = """
WITH wide AS (
  SELECT user_id,
         count(*) FILTER (WHERE event_type = 'click')    AS click,
         count(*) FILTER (WHERE event_type = 'error')    AS error,
         count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
         count(*) FILTER (WHERE event_type = 'signup')   AS signup,
         count(*) FILTER (WHERE event_type = 'view')     AS view
  FROM events GROUP BY user_id
)
SELECT user_id, kind AS event_type, n
FROM wide
UNPIVOT (n FOR kind IN (click, error, purchase, signup, view))
"""


def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming op (applyInPandasWithState session
    windows).  Emitted = completed sessions; each user's trailing open
    session stays in state, so the oracle excludes the last session per
    user."""
    import shutil

    from engine.spark import streaming

    src = tempfile.mkdtemp(prefix="sess_src_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{src}/part-0.parquet")
    ckpt = tempfile.mkdtemp(prefix="sess_ckpt_")
    sink = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    return streaming.stream_sessionize(spark, src, ckpt, sink_table=sink)


SQL_STREAM_SESSIONIZE = """
WITH e AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0
         END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
), agg AS (
  SELECT user_id, sid, min(ts) AS session_start, max(ts) AS session_end,
         count(*) AS n_events,
         -- round in DECIMAL space (exact HALF_UP), then cast: matches the
         -- engine's integer ten-thousandths accumulator bit-for-bit
         CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
  FROM s GROUP BY user_id, sid
), last AS (
  SELECT user_id, max(sid) AS last_sid FROM agg GROUP BY user_id
)
SELECT a.user_id, session_start, session_end, n_events, sum_value
FROM agg a JOIN last l ON a.user_id = l.user_id AND a.sid < l.last_sid
"""


def _doubled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup oracles' shared corpus: docs < 200 plus an exact twin
    of each shifted by +1000000 (same rows as _SQL_DOUBLED_DOCS)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select(
        "doc_id", "text"
    )
    return d.union(d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text"))


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair graph → connected components (alternating
    large-star/small-star, engine/spark/dedup.py) → cluster id per doc,
    singletons keeping their own id.  The DuckDB twin re-derives the
    same MinHash pair graph and labels components with a recursive-CTE
    min-label closure — an entirely different algorithm."""
    dd = _doubled_docs(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(dd, num_perm=32, bands=16)
    return dedup.dup_clusters(dd, pairs).orderBy("doc_id")


SQL_DUP_CLUSTERS = rf"""
WITH RECURSIVE pairs AS ({SQL_MINHASH_LSH}),
d AS ({_SQL_DOUBLED_DOCS}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
-- min-label closure: propagate a label l to node v only while l < v;
-- the component minimum reaches every member because all intermediate
-- nodes on a path from the min are larger than it
reach(n, l) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.v, r.l FROM reach r JOIN edges e ON e.u = r.n WHERE r.l < e.v
),
cc AS (SELECT n AS doc_id, min(l) AS cluster_id FROM reach GROUP BY n)
SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id
FROM d LEFT JOIN cc USING (doc_id)
"""


def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One kept representative per dup cluster (longest text, tie →
    lowest doc_id) + member count — the keep/drop decision a training
    pipeline makes after clustering."""
    dd = _doubled_docs(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(dd, num_perm=32, bands=16)
    clusters = dedup.dup_clusters(dd, pairs)
    return dedup.canonical_docs(dd, clusters).orderBy("cluster_id")


SQL_DEDUP_CANONICAL = rf"""
WITH RECURSIVE pairs AS ({SQL_MINHASH_LSH}),
d AS ({_SQL_DOUBLED_DOCS}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(n, l) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.v, r.l FROM reach r JOIN edges e ON e.u = r.n WHERE r.l < e.v
),
cc AS (SELECT n AS doc_id, min(l) AS cluster_id FROM reach GROUP BY n),
assign AS (
  SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
         length(d.text) AS len
  FROM d LEFT JOIN cc USING (doc_id)
),
ranked AS (
  SELECT cluster_id, doc_id,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY len DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM assign
)
SELECT cluster_id, doc_id AS keep_doc_id, n_members FROM ranked WHERE rn = 1
"""


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per doc by tf-idf (idf = ln(N/df),
    stopword df-cap at 50% before the term join)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return etext.tfidf_top_terms(d, k=5).orderBy("doc_id", "rank")


SQL_TFIDF_TOP_TERMS = r"""
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
n AS (SELECT count(*) AS n_docs FROM d),
tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+')) AS term
  FROM d
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok WHERE term != ''
  GROUP BY 1, 2
),
df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
  HAVING count(*) <= (SELECT floor(0.5 * n_docs)::BIGINT FROM n)
),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(tf.tf * ln((SELECT n_docs FROM n)::DOUBLE / df.df), 6) AS tfidf
  FROM tf JOIN df USING (term)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, tf, tfidf, rank FROM ranked WHERE rank <= 5
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language downsampling (the corpus-mixing
    primitive): hash-gated filter, zero shuffle, engine-portable."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    out = etext.stratified_sample(
        d,
        "lang",
        {"en": 0.5, "zh": 0.8, "es": 0.25},
        default_fraction=0.1,
    )
    return out.orderBy("doc_id")


SQL_STRATIFIED_SAMPLE = rf"""
WITH u AS (
  SELECT doc_id, lang,
         {_H60.format(x="'strat:' || doc_id::VARCHAR")} % 1000000 AS h
  FROM documents
)
SELECT doc_id, lang FROM u
WHERE (lang = 'en' AND h < 500000)
   OR (lang = 'zh' AND h < 800000)
   OR (lang = 'es' AND h < 250000)
   OR (lang NOT IN ('en', 'zh', 'es') AND h < 100000)
"""


def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user cardinality per event type (the exact twin of
    the approx_count_distinct production path, whose 2%-rsd HLL variant
    is bound-tested in tests/test_sampling.py — sketches can't be
    hash-matched across engines)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


SQL_DISTINCT_USERS = """
SELECT event_type, count(DISTINCT user_id) AS exact_users,
       count(*) AS n_events
FROM events GROUP BY event_type
"""


def q_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnostic: top-10 heaviest user_id keys with row share —
    the pre-flight check that sizes salting for a skewed shuffle."""
    e = _t(spark, sf_dir, "events")
    return diagnose.key_profile(e, "user_id", k=10)


SQL_KEY_PROFILE = """
WITH c AS (SELECT user_id AS key, count(*) AS n FROM events GROUP BY 1),
t AS (SELECT sum(n) AS total FROM c),
r AS (
  SELECT key, n, row_number() OVER (ORDER BY n DESC, key) AS rank FROM c
)
SELECT key, n, round(n / (SELECT total FROM t)::DOUBLE, 6) AS share, rank
FROM r WHERE rank <= 10
"""


def q_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental daily-ingest dedup: pairs touching the new batch only
    (new×new + new×corpus via a broadcast probe of the banded new batch;
    the corpus is never shuffled and corpus×corpus is never generated)."""
    old = _doubled_docs(spark, sf_dir)
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).select(
        "doc_id", "text"
    )
    new = d.select((F.col("doc_id") + 2000000).alias("doc_id"), "text").union(
        d.filter(F.col("doc_id") < 25).select(
            (F.col("doc_id") + 2100000).alias("doc_id"), "text"
        )
    )
    return dedup.minhash_incremental_pairs(
        new, old, num_perm=32, bands=16
    ).orderBy("doc_a", "doc_b")


SQL_MINHASH_INCREMENTAL = rf"""
WITH d AS (
  SELECT doc_id, text, FALSE AS is_new FROM documents WHERE doc_id < 200
  UNION ALL SELECT doc_id + 1000000, text, FALSE
    FROM documents WHERE doc_id < 200
  UNION ALL SELECT doc_id + 2000000, text, TRUE
    FROM documents WHERE doc_id < 50
  UNION ALL SELECT doc_id + 2100000, text, TRUE
    FROM documents WHERE doc_id < 25
),
tk AS (
  SELECT doc_id, is_new,
         regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+') AS t FROM d
),
g AS (
  SELECT doc_id, is_new, array_to_string(t[i:i+2], ' ') AS shingle
  FROM tk, UNNEST(range(1, greatest(len(t) - 3, 0) + 2)) r(i)
),
gd AS (SELECT DISTINCT doc_id, is_new, shingle FROM g),
code AS (
  SELECT doc_id, is_new,
         {_H60.format(x='shingle')} % 2147483647 AS code FROM gd
),
per AS (
  SELECT doc_id, is_new, i AS perm,
         min((((i * 1103515245 + 12345) % 2147483646 + 1) * code
              + (i * 2654435761 + 11) % 2147483647) % 2147483647) AS mh
  FROM code, UNNEST(range(0, 32)) r(i)
  GROUP BY 1, 2, 3
),
sig AS (
  SELECT doc_id, is_new, list(mh ORDER BY perm) AS sig FROM per GROUP BY 1, 2
),
banded AS (
  SELECT doc_id, is_new, sig, b AS band,
         md5(b || ':' || array_to_string(sig[b*2+1 : b*2+2], '-')) AS bucket
  FROM sig, UNNEST(range(0, 16)) r(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sig AS sig_a, b.sig AS sig_b,
         (a.is_new AND b.is_new) AS both_new
  FROM banded a
  JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
  WHERE a.is_new OR b.is_new
)
SELECT doc_a, doc_b,
       round(len(list_filter(range(1, 33), i -> sig_a[i] = sig_b[i])) / 32.0,
             4) AS est_jaccard,
       CASE WHEN both_new THEN 'new_new' ELSE 'new_corpus' END AS pair_type
FROM cand
"""


def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, hour) — all four grouping-set combinations
    in one Expand + single shuffle (the OLAP cross-dimension rollup)."""
    e = _t(spark, sf_dir, "events")
    return e.cube("event_type", F.hour("ts").alias("hour")).agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 2
        ).alias("sum_value"),
    )


SQL_EVENTS_CUBE = """
SELECT event_type, date_part('hour', ts)::INT AS hour, count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
         AS sum_value
FROM events GROUP BY CUBE (event_type, hour)
"""


def q_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extraction error channel: malformed payloads diverted with a
    reason instead of crashing or silently vanishing (the batch analog
    of the reference's per-page error markers, mistralocr_app.py:161)."""
    good = _docs_as_transcripts(spark, sf_dir)
    bad = spark.createDataFrame(
        [
            ("bad-1", 0, None),
            ("bad-1", 1, "   "),
            ("bad-2", 0, "<div>  </div>"),
            ("bad-2", 1, "<p>kept</p>"),
            ("bad-3", 0, ""),
            ("bad-4", 0, "\t\n"),  # ASCII-but-not-trim() whitespace
            ("bad-4", 1, "\u00a0"),  # NBSP: outside Java/RE2 \s
        ],
        "conv_id: string, turn_idx: int, text: string",
    )
    return pipeline.quarantine(good.unionByName(bad)).orderBy(
        "conv_id", "turn_idx"
    )


# blank rule shares pipeline.PY_WS_CLASS verbatim (Python-isspace set as
# literal chars — valid in both Java regex and DuckDB's RE2), so the two
# engines cannot drift on which whitespace counts as "empty"; the
# tab/newline-only and NBSP-only fixture rows below pin exactly the
# payloads where DuckDB trim()/ASCII-\s would have diverged
SQL_QUARANTINE = f"""
WITH src AS (
  SELECT 'doc-' || doc_id AS conv_id, 0 AS turn_idx,
         '# Doc ' || doc_id AS text FROM documents  -- never quarantined
  UNION ALL
  SELECT * FROM (VALUES
    ('bad-1', 0, NULL),
    ('bad-1', 1, '   '),
    ('bad-2', 0, '<div>  </div>'),
    ('bad-2', 1, '<p>kept</p>'),
    ('bad-3', 0, ''),
    ('bad-4', 0, chr(9) || chr(10)),
    ('bad-4', 1, chr(160))
  ) v(conv_id, turn_idx, text)
), cls AS (
  SELECT conv_id, turn_idx,
         CASE
           WHEN text IS NULL
                OR regexp_matches(text, '^{pipeline.PY_WS_CLASS}*$')
             THEN 'empty_payload'
           -- tag-only HTML: the structural parse strips to nothing
           WHEN regexp_matches(text,
                  '</?(html|body|article|section|main|div|nav|header|footer|aside|p|h[1-6]|ul|ol|li|table|thead|tbody|tr|th|td|pre|blockquote|span|a|b|i|em|strong|code|img|br|script|style)\\b')
                AND regexp_matches(
                      regexp_replace(text, '<[^>]*>', '', 'g'),
                      '^{pipeline.PY_WS_CLASS}*$')
             THEN 'empty_extraction'
         END AS reason
  FROM src
)
SELECT conv_id, turn_idx, reason FROM cls WHERE reason IS NOT NULL
"""


def q_json_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured tool-payload analytics: JSON field extraction
    (JVM-side get_json_object, no UDF) aggregated per type, with
    malformed/null payloads degrading to NULL instead of failing —
    transcripts' tool columns are exactly this shape."""
    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "props")
    bad = spark.createDataFrame(
        [(9000001, "corrupt", "not json"), (9000002, "corrupt", None)],
        "event_id: long, event_type: string, props: string",
    )
    # JSON text parse is the cost; spread the one-row-group scan so it
    # runs full-width (aggregation output is unchanged).  Spread the
    # SCAN side before the union: the planted createDataFrame side
    # already carries defaultParallelism empty slices, which would mask
    # the one-partition scan from the under-partitioned check.
    u = _spread(spark, e).unionByName(bad)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        u.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k).alias("sum_k"),
            F.sum(F.when(k.isNull(), 1).otherwise(0)).alias("null_k"),
        )
        .orderBy("event_type")
    )


SQL_JSON_FIELDS = """
WITH u AS (
  SELECT event_id, event_type, props FROM events
  UNION ALL
  SELECT * FROM (VALUES
    (9000001, 'corrupt', 'not json'),
    (9000002, 'corrupt', NULL)
  ) v(event_id, event_type, props)
), x AS (
  SELECT event_type,
         CASE WHEN props IS NOT NULL AND json_valid(props)
              THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
         END AS k
  FROM u
)
SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_k
FROM x GROUP BY 1
"""


def q_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): six-table join with
    region/date filters pushed to the scans, dims broadcast, revenue in
    exact decimal space."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
        )
    )
    return (
        j.groupBy("n_name")
        .agg(F.round(F.sum(disc).cast("double"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


SQL_Q5_LOCAL_SUPPLIER = """
SELECT n_name,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q_latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-version-per-key compaction (CDC upsert semantics): newest
    event per (user_id, event_type) by (ts, event_id).  Implemented as a
    single partial-aggregating groupBy over a (ts, event_id, value)
    struct max — one shuffle, no per-key sort, skew-safe (a hot key
    combines map-side instead of serialising onto one reducer's sort).
    The DuckDB twin uses a row_number window — independent algorithm."""
    e = _t(spark, sf_dir, "events")
    best = e.groupBy("user_id", "event_type").agg(
        F.max(F.struct("ts", "event_id", "value")).alias("m")
    )
    return best.select(
        "user_id",
        "event_type",
        F.col("m.event_id").alias("event_id"),
        F.col("m.ts").alias("ts"),
        F.col("m.value").alias("value"),
    ).orderBy("user_id", "event_type")


SQL_LATEST_EVENTS = """
WITH r AS (
  SELECT user_id, event_type, event_id, ts, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_type, event_id, ts, value FROM r WHERE rn = 1
"""


def q_stream_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quarantine error channel on the Structured Streaming path —
    stateless classification, so byte-identical to batch; shares
    SQL_QUARANTINE as its oracle."""
    import shutil

    from engine.spark import streaming

    good = _docs_as_transcripts(spark, sf_dir)
    bad = spark.createDataFrame(
        [
            ("bad-1", 0, None),
            ("bad-1", 1, "   "),
            ("bad-2", 0, "<div>  </div>"),
            ("bad-2", 1, "<p>kept</p>"),
            ("bad-3", 0, ""),
            ("bad-4", 0, "\t\n"),  # ASCII-but-not-trim() whitespace
            ("bad-4", 1, "\u00a0"),  # NBSP: outside Java/RE2 \s
        ],
        "conv_id: string, turn_idx: int, text: string",
    )
    src = tempfile.mkdtemp(prefix="stream_q_src_")
    good.unionByName(bad).write.mode("overwrite").parquet(src)
    ckpt = tempfile.mkdtemp(prefix="stream_q_ckpt_")
    outp = tempfile.mkdtemp(prefix="stream_q_out_")
    shutil.rmtree(outp)
    streaming.stream_quarantine(spark, src, ckpt, outp)
    return spark.read.parquet(outp).select("conv_id", "turn_idx", "reason")


def q_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-completeness gap detection (diagnose.sequence_gaps): the
    gaps-and-islands check via shifted self-ANTI-joins — boundary rows
    are local properties, so NO global-order window ever touches the
    facts (the empty-PARTITION-BY lag() is the classic single-reducer
    trap); only the tiny boundary table is ranked.  Fixture carves 10
    ids out of every 1000 from the event stream."""
    e = (
        _t(spark, sf_dir, "events")
        .filter(~((F.col("event_id") % 1000).between(500, 509)))
        .select("event_id")
    )
    return diagnose.sequence_gaps(e, "event_id").orderBy("gap_start")


SQL_SEQUENCE_GAPS = """
WITH ids AS (
  SELECT DISTINCT event_id AS id FROM events
  WHERE NOT (event_id % 1000 BETWEEN 500 AND 509)
), l AS (
  SELECT id, lead(id) OVER (ORDER BY id) AS nxt FROM ids
)
SELECT id + 1 AS gap_start, nxt - 1 AS gap_end, nxt - 1 - id AS gap_len
FROM l WHERE nxt > id + 1
ORDER BY gap_start
"""


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column catalog stats in ONE scan (diagnose.column_profile,
    the ANALYZE TABLE analog): (col, n_nonnull, n_null, ndv) for five
    events columns via a single multi-DISTINCT agg (one Expand pass)
    melted with stack().  Exact NDV is the oracle pin; production flips
    exact_ndv=False for the mergeable HLL path (distinct_users twin
    discipline)."""
    return diagnose.column_profile(
        _t(spark, sf_dir, "events"),
        cols=["event_id", "user_id", "event_type", "value", "props"],
    ).orderBy("col")


SQL_COLUMN_PROFILE = """
WITH s AS (
  SELECT 'event_id' AS col, count(event_id) AS n_nonnull,
         count(*) - count(event_id) AS n_null,
         count(DISTINCT event_id) AS ndv FROM events
  UNION ALL
  SELECT 'user_id', count(user_id), count(*) - count(user_id),
         count(DISTINCT user_id) FROM events
  UNION ALL
  SELECT 'event_type', count(event_type), count(*) - count(event_type),
         count(DISTINCT event_type) FROM events
  UNION ALL
  SELECT 'value', count(value), count(*) - count(value),
         count(DISTINCT value) FROM events
  UNION ALL
  SELECT 'props', count(props), count(*) - count(props),
         count(DISTINCT props) FROM events
)
SELECT * FROM s ORDER BY col
"""


def q_footer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates answered from parquet FOOTER metadata
    (pipeline.footer_stats): COUNT/MIN/MAX pushed into the V2 parquet
    scan — the plan reads row-group statistics, never data pages
    (asserted in tests/test_plans.py); confs are planning-scoped and
    restored.  At 100 TB: a metadata round-trip instead of a scan."""
    return pipeline.footer_stats(
        spark,
        f"{sf_dir}/events.parquet",
        count=True,
        min_cols=("event_id", "value"),
        max_cols=("event_id", "value"),
    )


SQL_FOOTER_STATS = """
SELECT count(*) AS n_rows,
       min(event_id) AS min_event_id, min(value) AS min_value,
       max(event_id) AS max_event_id, max(value) AS max_value
FROM events
"""


def q_extraction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational rollup of an extraction run: turn/conv/image counts
    and total extracted bytes in one partial-agg pass over the turns
    output — the dashboard row a 10^12-turn job emits per snapshot.
    The oracle re-derives every number from the input (image count via
    regexp over the assembled markdown, not trusted from the engine)."""
    turns = pipeline.extract_turns(_docs_as_transcripts(spark, sf_dir))
    return turns.agg(
        F.count("*").alias("n_turns"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.sum(F.size("images")).alias("n_images"),
        F.sum(F.length("markdown")).alias("md_chars"),
    )


SQL_EXTRACTION_REPORT = rf"""
WITH turns AS ({SQL_EXTRACT_MARKDOWN})
SELECT count(*) AS n_turns,
       count(DISTINCT conv_id) AS n_convs,
       CAST(sum(len(regexp_extract_all(markdown,
                                       '!\[img-1\.jpeg\]\(images_')))
            AS BIGINT) AS n_images,
       CAST(sum(length(markdown)) AS BIGINT) AS md_chars
FROM turns
"""


def q_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second REAL codec path: deterministic synthetic PCM-16 WAVs
    decoded by the pure-stdlib RIFF parser inside Arrow batches.  The
    oracle re-derives rate/counts AND the integer abs-sum of all decoded
    samples from the generation formula — header walk, chunk alignment,
    and sample decode all sit under the hard cross-engine signal."""
    media = multimodal.wav_media_from_documents(_t(spark, sf_dir, "documents"))
    return multimodal.extract_audio_features(media)


SQL_WAV_FEATURES = """
SELECT doc_id AS media_id,
       (8000 + (doc_id % 4) * 4000)::INTEGER AS sample_rate,
       1::INTEGER AS n_channels,
       16::INTEGER AS bits,
       (doc_id % 50 + 10)::INTEGER AS n_samples,
       CAST(list_sum(list_transform(range(0, doc_id % 50 + 10),
              i -> abs((doc_id * 131 + i * 17) % 2003 - 1001)))
            AS BIGINT) AS sample_abs_sum
FROM documents
"""


def q_variant_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics as json_fields but through Spark 4's VariantType
    (try_parse_json → try_variant_get): the binary variant encoding is
    parsed once and fields are extracted without re-parsing the JSON
    text per path — the SURVEY §1 recommendation for the reference's
    schemaless ocr_contents dict.  Malformed/null payloads degrade to
    NULL (try_ variants), identical to the get_json_object path, so the
    two engines AND the two Spark codepaths share one oracle."""
    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "props")
    bad = spark.createDataFrame(
        [(9000001, "corrupt", "not json"), (9000002, "corrupt", None)],
        "event_id: long, event_type: string, props: string",
    )
    u = _spread(spark, e).unionByName(bad)  # see json_fields
    k = F.try_variant_get(F.try_parse_json(F.col("props")), "$.k", "long")
    return (
        u.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k).alias("sum_k"),
            F.sum(F.when(k.isNull(), 1).otherwise(0)).alias("null_k"),
        )
        .orderBy("event_type")
    )


# -------------------------------------------------------------------- driver
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline on sf0.001 documents-as-turns."""
    return q_extract_markdown(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Round-4 additions: the LLM-training-data preparation quartet + the
# decontamination screen — each a Catalyst-only construction with an
# exact DuckDB twin.


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation — the composed pipeline a training-data
    job actually runs: repetition/length quality gates + exact-dedup
    keep-list, rolled up per language.  Composition of already-oracled
    parts (repetition_stats, md5 fingerprint dedup), so the twin
    re-derives every stage in SQL.  Shape: two doc_id-keyed partial-agg
    joins + one small rollup — no new shuffle patterns."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    planted = spark.createDataFrame(
        [
            (9000001, "xx", "spam spam spam spam spam spam spam spam"),
            (9000002, "xx", "a perfectly fine short document of nine tokens"),
            (9000003, "xx", "a perfectly fine short document of nine tokens"),
            (9000004, "xx", "tiny doc"),
        ],
        "doc_id: long, lang: string, text: string",
    )
    u = d.unionByName(planted)
    rep = etext.repetition_stats(u)
    fp = u.select("doc_id", etext.fingerprint(F.col("text")).alias("fp"))
    keep_min = fp.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    j = (
        u.join(rep, "doc_id", "left")
        .join(fp, "doc_id")
        .join(keep_min, "fp")
    )
    kept = (
        F.coalesce(F.col("dup_bigram_ratio") <= 0.5, F.lit(False))
        & F.coalesce(F.col("n_tokens") >= 5, F.lit(False))
        & (F.col("doc_id") == F.col("keep_id"))
    )
    return j.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.sum(kept.cast("long")).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_tokens")).otherwise(0)).alias(
            "kept_tokens"
        ),
    )


SQL_CORPUS_CURATION = r"""
WITH src AS (
  SELECT doc_id, lang, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES
    (9000001, 'xx', 'spam spam spam spam spam spam spam spam'),
    (9000002, 'xx', 'a perfectly fine short document of nine tokens'),
    (9000003, 'xx', 'a perfectly fine short document of nine tokens'),
    (9000004, 'xx', 'tiny doc')
  ) v(doc_id, lang, text)
), tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+')) AS tok
  FROM src
), pt AS (
  SELECT doc_id, tok, count(*) AS c FROM tok WHERE tok <> '' GROUP BY 1, 2
), st AS (
  SELECT doc_id, sum(c)::BIGINT AS n_tokens FROM pt GROUP BY 1
), tg AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+') AS t FROM src
), g AS (
  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS shingle
  FROM tg, UNNEST(range(1, greatest(len(t) - 2, 0) + 2)) AS r(i)
), bg AS (
  SELECT doc_id, count(DISTINCT shingle) AS n_bi FROM g GROUP BY 1
), rep AS (
  SELECT st.doc_id, n_tokens,
         CASE WHEN n_tokens > 1
              THEN round(1 - n_bi / (n_tokens - 1)::DOUBLE, 6) END AS dbr
  FROM st LEFT JOIN bg ON st.doc_id = bg.doc_id
), fp AS (
  SELECT doc_id,
         md5(lower(regexp_replace(text, '[ \t\n\x0b\f\r]+', ' ', 'g'))) AS fp
  FROM src
), km AS (
  SELECT fp, min(doc_id) AS keep_id FROM fp GROUP BY 1
), j AS (
  SELECT src.doc_id, src.lang,
         coalesce(rep.dbr <= 0.5, FALSE)
           AND coalesce(rep.n_tokens >= 5, FALSE)
           AND src.doc_id = km.keep_id AS kept,
         coalesce(rep.n_tokens, 0) AS n_tokens
  FROM src
  LEFT JOIN rep ON src.doc_id = rep.doc_id
  JOIN fp ON src.doc_id = fp.doc_id
  JOIN km ON fp.fp = km.fp
)
SELECT lang, count(*) AS n_total,
       sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       sum(CASE WHEN kept THEN n_tokens ELSE 0 END)::BIGINT AS kept_tokens
FROM j GROUP BY lang
"""


def q_stream_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup against a persisted corpus band store
    (dedup.band_table + foreachBatch probe, streaming.stream_near_dup):
    the SAME new docs as q_minhash_incremental, deliberately split
    across TWO micro-batches — the accumulating band store must make
    the split invisible (cross-batch new×new pairs typed new_new), so
    this shares SQL_MINHASH_INCREMENTAL verbatim."""
    import shutil

    from engine.spark import streaming

    old = _doubled_docs(spark, sf_dir)
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).select(
        "doc_id", "text"
    )
    batch1 = d.select((F.col("doc_id") + 2000000).alias("doc_id"), "text")
    batch2 = d.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 2100000).alias("doc_id"), "text"
    )
    src = tempfile.mkdtemp(prefix="snd_src_")
    # one file per write => maxFilesPerTrigger=1 makes them two batches
    batch1.coalesce(1).write.mode("append").parquet(src)
    batch2.coalesce(1).write.mode("append").parquet(src)
    ckpt = tempfile.mkdtemp(prefix="snd_ckpt_")
    outp = tempfile.mkdtemp(prefix="snd_out_")
    store = tempfile.mkdtemp(prefix="snd_store_")
    shutil.rmtree(outp)
    shutil.rmtree(store)
    streaming.stream_near_dup(
        spark, src, old, ckpt, outp, store, num_perm=32, bands=16
    )
    return (
        spark.read.parquet(outp)
        .drop("ingest_batch")  # sink partition stamp, not pair data
        .dropDuplicates(["doc_a", "doc_b"])
        .orderBy("doc_a", "doc_b")
    )


def q_full_outer_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-source reconciliation via FULL OUTER join — the data-audit
    staple: per key, activity counts from two independent tables with a
    left_only/right_only/both status.  One shuffle per aggregate + the
    outer join; at scale both sides are pre-aggregated (compact) before
    joining, never fact×fact."""
    e = _t(spark, sf_dir, "events").groupBy(
        F.col("user_id").alias("key")
    ).agg(F.count("*").alias("n_events"))
    o = _t(spark, sf_dir, "orders").groupBy(
        F.col("o_custkey").alias("key")
    ).agg(F.count("*").alias("n_orders"))
    j = e.join(o, "key", "full_outer")
    status = (
        F.when(F.col("n_events").isNull(), F.lit("right_only"))
        .when(F.col("n_orders").isNull(), F.lit("left_only"))
        .otherwise(F.lit("both"))
    )
    return j.select(
        "key",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        status.alias("status"),
    )


SQL_FULL_OUTER_RECON = """
WITH e AS (
  SELECT user_id AS key, count(*) AS n_events FROM events GROUP BY 1
), o AS (
  SELECT o_custkey AS key, count(*) AS n_orders FROM orders GROUP BY 1
)
SELECT coalesce(e.key, o.key) AS key,
       coalesce(n_events, 0) AS n_events,
       coalesce(n_orders, 0) AS n_orders,
       CASE WHEN e.key IS NULL THEN 'right_only'
            WHEN o.key IS NULL THEN 'left_only'
            ELSE 'both' END AS status
FROM e FULL OUTER JOIN o ON e.key = o.key
"""


def q_value_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE decile assignment per event_type — the bucketing primitive
    behind per-segment score calibration — via the engine's DISTRIBUTED
    ranking op (diagnose.distributed_ntile): range-repartitioned local
    ranks + a metadata-scale offset histogram, never
    `ntile().over(partitionBy(event_type))` whose window sorts an
    entire event type's fact rows on ONE reducer (the VERDICT r4
    scale-killer).  NULL-safe part keys and a one-entry-bounded persist
    live in the engine op; plan shape pinned in
    tests/test_plans.py::test_value_ntile_no_per_type_sort."""
    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return diagnose.distributed_ntile(
        e, part_col="event_type", value_col="value", id_col="event_id"
    ).select("event_id", "event_type", F.col("bucket").alias("decile"))


SQL_VALUE_NTILE = """
SELECT event_id, event_type,
       ntile(10) OVER (PARTITION BY event_type
                       ORDER BY value ASC, event_id ASC)::BIGINT AS decile
FROM events
"""


def q_events_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling (resample-to-hourly with zero-fill): per
    user, every hour between their first and last event exists in the
    output, missing hours at n=0 — the densification step before any
    rolling/derivative analytics.  Spark shape: compact per-user
    min/max agg → F.sequence+explode generates the hour spine (no
    driver loop, no cross join) → left join of the hourly counts."""
    e = _t(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
    ).where(F.col("user_id") < 40)
    counts = e.groupBy("user_id", "h").agg(F.count("*").alias("n_obs"))
    spine = (
        e.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h"),
        )
    )
    return spine.join(counts, ["user_id", "h"], "left").select(
        "user_id",
        F.col("h").alias("hour_epoch"),
        F.coalesce("n_obs", F.lit(0)).cast("long").alias("n"),
    )


SQL_EVENTS_RESAMPLE = """
WITH e AS (
  SELECT user_id, floor(epoch(ts) / 3600)::BIGINT AS h
  FROM events WHERE user_id < 40
), counts AS (
  SELECT user_id, h, count(*) AS n_obs FROM e GROUP BY 1, 2
), spine AS (
  SELECT user_id, unnest(range(min(h), max(h) + 1)) AS h
  FROM e GROUP BY user_id
)
SELECT s.user_id, s.h AS hour_epoch, coalesce(n_obs, 0)::BIGINT AS n
FROM spine s LEFT JOIN counts c ON s.user_id = c.user_id AND s.h = c.h
"""


def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 min-max embedding quantization (similarity.quantize_
    embeddings) — 4× corpus-memory reduction for ANN at 10^10+ vectors.
    Codes exploded to scalar rows for the cross-engine compare; the
    floor(+0.5) half-up rounding is spelled identically in both engines
    (Spark round() and DuckDB round() disagree on ties).

    posexplode_OUTER, deliberately: with the inner generate, the
    optimizer infers ``size(codes) > 0 AND isnotnull(codes)`` and
    pushes it into a non-codegen Filter with the whole quantization
    expression inlined — array_min/array_max re-evaluated inside the
    per-element lambda, interpreted (measured 12.4 s for 200 vectors at
    sf1.0; 0.2 s without).  codes is never null/empty here (transform
    of a non-null embedding), so outer == inner on any input this
    query sees, row for row."""
    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    q = similarity.quantize_embeddings(emb)
    return q.select(
        "vec_id",
        F.posexplode_outer("codes").alias("pos", "code"),
        "mn",
        "mx",
    ).select("vec_id", F.col("pos").cast("long").alias("pos"), "code", "mn", "mx")


SQL_QUANTIZE_EMBEDDINGS = """
WITH src AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200
), b AS (
  SELECT vec_id, embedding,
         list_min(embedding)::DOUBLE AS mn,
         list_max(embedding)::DOUBLE AS mx
  FROM src
)
SELECT vec_id, (i - 1)::BIGINT AS pos,
       CASE WHEN mx = mn THEN -128
            ELSE (floor((embedding[i]::DOUBLE - mn) * 255 / (mx - mn)
                        + 0.5) - 128)::INT
       END AS code,
       mn, mx
FROM b, UNNEST(range(1, len(embedding) + 1)) AS r(i)
"""


def q_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint validation (diagnose.check_constraints,
    Deequ/dbt-tests analog): four rules over events + planted bad rows,
    all evaluated in ONE scan (single partial agg + constant unpivot).
    Null conditions count as violations (expectation semantics)."""
    e = _t(spark, sf_dir, "events")
    bad = spark.createDataFrame(
        [
            (9000001, None, None, "click", -5.0, None),
            (9000002, None, 3, "bogus", 1.0, None),
        ],
        "event_id: long, ts: timestamp, user_id: long, "
        "value_ignore: string, value: double, props: string",
    ).select(
        "event_id", "ts", "user_id",
        F.col("value_ignore").alias("event_type"), "value", "props",
    )
    u = e.unionByName(bad)
    kinds = ["click", "error", "purchase", "signup", "view"]
    rules = [
        ("user_id_not_null", F.col("user_id").isNotNull()),
        ("value_non_negative", F.col("value") >= 0),
        ("event_type_known", F.col("event_type").isin(kinds)),
        ("ts_not_null", F.col("ts").isNotNull()),
    ]
    return diagnose.check_constraints(u, rules)


SQL_DATA_QUALITY = """
WITH src AS (
  SELECT event_id, ts, user_id, event_type, value FROM events
  UNION ALL
  SELECT * FROM (VALUES
    (9000001, NULL::TIMESTAMP, NULL::BIGINT, 'click', -5.0),
    (9000002, NULL::TIMESTAMP, 3, 'bogus', 1.0)
  ) v(event_id, ts, user_id, event_type, value)
), wide AS (
  SELECT
    sum(CASE WHEN coalesce(user_id IS NOT NULL, FALSE)
             THEN 0 ELSE 1 END)::BIGINT AS user_id_not_null,
    sum(CASE WHEN coalesce(value >= 0, FALSE)
             THEN 0 ELSE 1 END)::BIGINT AS value_non_negative,
    sum(CASE WHEN coalesce(event_type IN
               ('click','error','purchase','signup','view'), FALSE)
             THEN 0 ELSE 1 END)::BIGINT AS event_type_known,
    sum(CASE WHEN coalesce(ts IS NOT NULL, FALSE)
             THEN 0 ELSE 1 END)::BIGINT AS ts_not_null,
    count(*)::BIGINT AS n_rows
  FROM src
)
SELECT rule, n_violations, n_rows
FROM wide
UNPIVOT (n_violations FOR rule IN
         (user_id_not_null, value_non_negative,
          event_type_known, ts_not_null))
"""


def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment (streaming lookup-join):
    stateless per micro-batch, so byte-identical to the batch join —
    the oracle is the plain SQL join."""
    import shutil

    from engine.spark import streaming

    dim = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    src = tempfile.mkdtemp(prefix="enrich_src_")
    _t(spark, sf_dir, "events").coalesce(2).write.mode("overwrite").parquet(src)
    ckpt = tempfile.mkdtemp(prefix="enrich_ckpt_")
    outp = tempfile.mkdtemp(prefix="enrich_out_")
    shutil.rmtree(outp)
    streaming.stream_enrich(spark, src, dim, ckpt, outp)
    return spark.read.parquet(outp).select(
        "event_id", "user_id", "event_type", "c_name",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
    )


SQL_STREAM_ENRICH = """
SELECT e.event_id, e.user_id, e.event_type, c.c_name,
       c.c_nationkey::BIGINT AS c_nationkey
FROM events e JOIN customer c ON e.user_id = c.c_custkey
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS + grouping_id — the general form of
    rollup/cube (one Expand + ONE shuffle for an arbitrary set list;
    grouping_id disambiguates which set produced a row, exactly how a
    materialized-aggregate table serves mixed-granularity dashboards)."""
    e = _t(spark, sf_dir, "events")
    v = f"events_gs_{uuid.uuid4().hex[:8]}"
    e.select(
        "event_type", F.hour("ts").alias("hour"), "value"
    ).createOrReplaceTempView(v)
    return spark.sql(f"""
        SELECT event_type, hour,
               CAST(grouping_id(event_type, hour) AS BIGINT) AS gid,
               count(*) AS n,
               round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
                 AS sum_value
        FROM {v}
        GROUP BY GROUPING SETS ((event_type), (event_type, hour), ())
    """)


SQL_GROUPING_SETS = """
SELECT event_type, date_part('hour', ts)::INT AS hour,
       GROUPING(event_type, date_part('hour', ts)::INT)::BIGINT AS gid,
       count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
         AS sum_value
FROM events
GROUP BY GROUPING SETS ((event_type), (event_type, hour), ())
"""


def q_sliding_window_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour RANGE-frame window per user (event-time sliding
    aggregate — the batch twin of the streaming windowed counts): frame
    bounds are VALUE-based (epoch seconds), not row counts, so ties and
    gaps behave identically in both engines.  One shuffle on user_id
    with bounded per-user frames."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    sec = F.unix_timestamp("ts").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-3599, Window.currentRow)
    )
    avg = F.avg(F.col("value").cast("decimal(18,4)")).over(w).cast(
        "double"
    )
    # floor(x*1e4 + 0.5)/1e4, NOT round(): Spark's and DuckDB's round()
    # disagree on 4th-decimal ties (HALF_UP on a BigDecimal vs
    # std::round on a double), so the tie rule is spelled explicitly in
    # both engines — same rule as quantize_embeddings' coder
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("long").alias("n_1h"),
        (F.floor(avg * 10000 + F.lit(0.5)) / 10000).alias("avg_1h"),
    )


SQL_SLIDING_WINDOW_AVG = """
SELECT event_id, user_id,
       count(*) OVER w::BIGINT AS n_1h,
       floor(CAST(avg(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
             * 10000 + 0.5) / 10000 AS avg_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)::BIGINT
             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction with per-doc counts: emails, IPv4, phone-like
    runs replaced by typed placeholders.  Zero-shuffle projection —
    three regexp_count + three regexp_replace in whole-stage codegen;
    patterns are shared verbatim with the oracle (Java-regex ∩ RE2)."""
    d = _spread(spark, _t(spark, sf_dir, "documents")).select("doc_id", "text")
    planted = spark.createDataFrame(
        [
            (9000001, "contact bob@example.com or +1 (555) 123-4567 today"),
            (9000002, "server at 10.0.0.1 mailed alice.smith+x@sub.example.org"),
            (9000003, "no pii here at all"),
            (9000004, "dial 555 867 5309 twice: 555 867 5309"),
        ],
        "doc_id: long, text: string",
    )
    return etext.pii_scrub(d.unionByName(planted))


SQL_PII_SCRUB = f"""
WITH src AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES
    (9000001, 'contact bob@example.com or +1 (555) 123-4567 today'),
    (9000002, 'server at 10.0.0.1 mailed alice.smith+x@sub.example.org'),
    (9000003, 'no pii here at all'),
    (9000004, 'dial 555 867 5309 twice: 555 867 5309')
  ) v(doc_id, text)
), e AS (
  SELECT doc_id,
         regexp_replace(text, '{etext.PII_EMAIL}', '<EMAIL>', 'g') AS t1,
         len(regexp_extract_all(text, '{etext.PII_EMAIL}'))::BIGINT AS n_emails
  FROM src
), i AS (
  SELECT doc_id, regexp_replace(t1, '{etext.PII_IPV4}', '<IP>', 'g') AS t2,
         n_emails,
         len(regexp_extract_all(t1, '{etext.PII_IPV4}'))::BIGINT AS n_ips
  FROM e
)
SELECT doc_id,
       regexp_replace(t2, '{etext.PII_PHONE}', '<PHONE>', 'g') AS clean_text,
       n_emails, n_ips,
       len(regexp_extract_all(t2, '{etext.PII_PHONE}'))::BIGINT AS n_phones
FROM i
"""


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-artifact cleanup (etext.text_normalize — the ftfy-lite
    pre-tokenization pass): CR/CRLF→LF, NBSP→space, zero-width chars
    and non-whitespace controls removed, ≥4-runs of sentence
    punctuation collapsed to three.  Zero-shuffle codegen projection;
    planted rows fire every branch (ZW/NBSP, punct runs, control+CR,
    and an untouched row proving changed=false).  Patterns shared
    verbatim with the oracle (Java ∩ RE2, no backreferences)."""
    d = _spread(spark, _t(spark, sf_dir, "documents")).select("doc_id", "text")
    planted = spark.createDataFrame(
        [
            (
                9100001,
                "soft\u00a0space and\u200bzero\u200cwidth\u200d"
                " marks\ufeff",
            ),
            (9100002, "dots..... bangs!!!!! what????? fine... ok!!"),
            (9100003, "ctrl\x01chars\x1fhere\r\nwindows\rline"),
            (9100004, "clean text unchanged"),
        ],
        "doc_id: long, text: string",
    )
    return etext.text_normalize(d.unionByName(planted))


SQL_TEXT_NORMALIZE = f"""
WITH src AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES
    (9100001, 'soft' || chr(160) || 'space and' || chr(8203) || 'zero'
              || chr(8204) || 'width' || chr(8205) || ' marks'
              || chr(65279)),
    (9100002, 'dots..... bangs!!!!! what????? fine... ok!!'),
    (9100003, 'ctrl' || chr(1) || 'chars' || chr(31) || 'here'
              || chr(13) || chr(10) || 'windows' || chr(13) || 'line'),
    (9100004, 'clean text unchanged')
  ) v(doc_id, text)
), n AS (
  SELECT doc_id, text,
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(text, '{etext.NORM_CR}', chr(10), 'g'),
                '{etext.NORM_NBSP}', ' ', 'g'),
              '{etext.NORM_ZERO_WIDTH}', '', 'g'),
            '{etext.NORM_CTRL}', '', 'g'),
          '{etext.NORM_DOT_RUN}', '...', 'g'),
        '{etext.NORM_BANG_RUN}', '!!!', 'g'),
      '{etext.NORM_QMARK_RUN}', '???', 'g') AS norm_text
  FROM src
)
SELECT doc_id, norm_text,
       len(regexp_extract_all(text, '{etext.NORM_ZERO_WIDTH}'))::BIGINT
         AS n_zero_width,
       len(regexp_extract_all(text, '{etext.NORM_CTRL}'))::BIGINT
         AS n_ctrl,
       norm_text != text AS changed
FROM n
"""


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy release audit (diagnose.k_anonymity): k-anonymity +
    l-diversity per quasi-identifier combination (hour-of-day ×
    value band) over the events table, individuals = user_id,
    sensitive attribute = event_type.  ONE groupBy with the
    multi-COUNT(DISTINCT) planned as a single Expand — no joins, no
    windows, no second pass; output bounded by QI cardinality."""
    e = _t(spark, sf_dir, "events").select(
        F.hour("ts").alias("hour_of_day"),
        (F.floor(F.col("value") / 10) * 10)
        .cast("long")
        .alias("value_band"),
        "user_id",
        "event_type",
    )
    return diagnose.k_anonymity(
        e,
        ["hour_of_day", "value_band"],
        id_col="user_id",
        sensitive_col="event_type",
        k=5,
        l=2,
    )


SQL_K_ANONYMITY = """
SELECT hour(ts) AS hour_of_day,
       (floor(value / 10) * 10)::BIGINT AS value_band,
       count(*)::BIGINT AS n_rows,
       count(DISTINCT user_id)::BIGINT AS n_individuals,
       count(DISTINCT event_type)::BIGINT AS n_sensitive,
       count(DISTINCT user_id) >= 5 AS k_anonymous,
       count(DISTINCT event_type) >= 2 AS l_diverse
FROM events
GROUP BY 1, 2
"""


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition quality signals: duplicate-token and
    duplicate-bigram fractions + heaviest-token share, per document."""
    d = _spread(spark, _t(spark, sf_dir, "documents")).select("doc_id", "text")
    planted = spark.createDataFrame(
        [
            (9000001, "spam spam spam spam spam spam"),
            (9000002, "one two three four five six seven eight"),
        ],
        "doc_id: long, text: string",
    )
    return etext.repetition_stats(d.unionByName(planted))


SQL_REPETITION_STATS = r"""
WITH src AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES
    (9000001, 'spam spam spam spam spam spam'),
    (9000002, 'one two three four five six seven eight')
  ) v(doc_id, text)
), tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+')) AS tok
  FROM src
), pt AS (
  SELECT doc_id, tok, count(*) AS c FROM tok WHERE tok <> ''
  GROUP BY 1, 2
), st AS (
  SELECT doc_id, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_distinct,
         max(c) AS top_c
  FROM pt GROUP BY 1
), tg AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+') AS t
  FROM src
), g AS (
  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS shingle
  FROM tg, UNNEST(range(1, greatest(len(t) - 2, 0) + 2)) AS r(i)
), bg AS (
  SELECT doc_id, count(DISTINCT shingle) AS n_distinct_bigrams
  FROM g GROUP BY 1
)
SELECT st.doc_id, n_tokens, n_distinct,
       round(n_distinct / n_tokens::DOUBLE, 6) AS distinct_ratio,
       round(top_c / n_tokens::DOUBLE, 6) AS top_share,
       CASE WHEN n_tokens > 1
            THEN round(1 - n_distinct_bigrams / (n_tokens - 1)::DOUBLE, 6)
       END AS dup_bigram_ratio
FROM st LEFT JOIN bg ON st.doc_id = bg.doc_id
"""


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (64-token windows, 16-token overlap) for
    context-length-bounded training — zero-shuffle generate-projection."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.col("doc_id") < 200
    )
    return etext.doc_chunks(d, chunk_tokens=64, overlap=16)


SQL_DOC_CHUNKS = r"""
WITH tokd AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+') AS t
  FROM documents WHERE doc_id < 200
), nn AS (
  SELECT doc_id, t,
         CASE WHEN len(t) = 1 AND t[1] = '' THEN 0 ELSE len(t) END AS n
  FROM tokd
), c AS (
  SELECT doc_id, t, n, i AS chunk_idx
  FROM nn,
       UNNEST(range(0, 1 + ceil(greatest(n - 64, 0) / 48.0)::INT)) AS r(i)
)
SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
       array_to_string(t[chunk_idx*48 + 1 : chunk_idx*48 + 64], ' ')
         AS chunk_text,
       least(64, greatest(n - chunk_idx*48, 0))::BIGINT AS n_tokens
FROM c
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic next-fit sequence packing into 512-token bins
    within bounded (source, doc_id % 8) window partitions — the
    hot-key-safe batch-construction pass."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return etext.pack_sequences(d, capacity=512, n_buckets=8)


SQL_PACK_SEQUENCES = r"""
WITH base AS (
  SELECT doc_id, source, (doc_id % 8)::INT AS bucket,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+'))
         END::BIGINT AS n_tokens
  FROM documents
)
SELECT doc_id, source, bucket,
       floor((sum(n_tokens) OVER (PARTITION BY source, bucket
                                  ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens)
             / 512.0)::BIGINT AS bin_id,
       n_tokens
FROM base
"""


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing an 8-token gram
    with a (broadcast) benchmark set.  The benchmark is derived
    deterministically from the corpus itself (first 20 tokens of docs
    3 and 7, re-keyed +1000000) so both engines construct the identical
    eval set and the planted leakage is guaranteed."""
    d = _spread(spark, _t(spark, sf_dir, "documents")).select("doc_id", "text")
    toks = F.split(F.trim(F.lower(F.col("text"))), etext.WS)
    bench = d.where(F.col("doc_id").isin(3, 7)).select(
        (F.col("doc_id") + 1000000).alias("bench_id"),
        F.array_join(F.slice(toks, 1, 20), " ").alias("text"),
    )
    return dedup.contamination_screen(d, bench, n=8)


SQL_CONTAMINATION = r"""
WITH bench AS (
  SELECT doc_id + 1000000 AS bench_id,
         array_to_string(regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+')[1:20],
                         ' ') AS text
  FROM documents WHERE doc_id IN (3, 7)
), bt AS (
  SELECT bench_id, regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+') AS t
  FROM bench
), bgr AS (
  SELECT bench_id, array_to_string(t[i:i+7], ' ') AS shingle
  FROM bt, UNNEST(range(1, greatest(len(t) - 8, 0) + 2)) AS r(i)
), bg AS (
  SELECT DISTINCT bench_id, shingle FROM bgr
), dt AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+') AS t
  FROM documents
), dgr AS (
  SELECT doc_id, array_to_string(t[i:i+7], ' ') AS shingle
  FROM dt, UNNEST(range(1, greatest(len(t) - 8, 0) + 2)) AS r(i)
), dg AS (
  SELECT DISTINCT doc_id, shingle FROM dgr
)
SELECT dg.doc_id, bg.bench_id, count(*)::BIGINT AS n_shared
FROM dg JOIN bg USING (shingle)
WHERE dg.doc_id <> bg.bench_id
GROUP BY 1, 2
"""


def q_ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality scoring (text.ngram_lm_scores, the CCNet-style
    perplexity filter): train an add-1-smoothed bigram model on
    documents 200-399, score documents < 60 plus one planted all-OOV
    gibberish doc (exercises the unseen-word coalesce path, and must
    come out with the worst avg_nll).  The DuckDB twin retrains the
    same counts and reproduces the DECIMAL(20,6) log-prob accumulation
    exactly."""
    d = _t(spark, sf_dir, "documents")
    ref = d.filter(
        (F.col("doc_id") >= 200) & (F.col("doc_id") < 400)
    ).select("doc_id", "text")
    score = (
        d.filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
        .unionByName(
            spark.createDataFrame(
                [(9300001, "zq zq xv xv qqj qqj zzk")],
                "doc_id: long, text: string",
            )
        )
    )
    return etext.ngram_lm_scores(score, ref, alpha=1.0).orderBy("doc_id")


SQL_NGRAM_LM_SCORE = r"""
WITH refd AS (
  SELECT list_filter(regexp_split_to_array(trim(lower(text)),
                                           '[ \t\n\x0b\f\r]+'),
                     t -> t <> '') AS t
  FROM documents WHERE doc_id >= 200 AND doc_id < 400
),
uni AS (
  SELECT w, count(*) AS c1
  FROM (SELECT unnest(t) AS w FROM refd) GROUP BY w
),
v AS (SELECT (count(*) + 1)::DOUBLE AS vsz FROM uni),
big AS (
  SELECT t[i] AS w1, t[i + 1] AS w2, count(*) AS c2
  FROM refd, UNNEST(range(1, len(t))) r(i)
  WHERE len(t) >= 2
  GROUP BY 1, 2
),
sd AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)),
                                           '[ \t\n\x0b\f\r]+'),
                     t -> t <> '') AS t
  FROM (SELECT doc_id, text FROM documents WHERE doc_id < 60
        UNION ALL
        SELECT * FROM (VALUES (9300001, 'zq zq xv xv qqj qqj zzk'))
               AS x(doc_id, text))
),
sp AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM sd, UNNEST(range(1, len(t))) r(i)
  WHERE len(t) >= 2
),
sc AS (
  SELECT sp.doc_id,
         round(ln((coalesce(big.c2, 0) + 1.0)
                  / (coalesce(uni.c1, 0) + 1.0 * v.vsz)),
               6)::DECIMAL(20,6) AS lp
  FROM sp
  LEFT JOIN big ON sp.w1 = big.w1 AND sp.w2 = big.w2
  LEFT JOIN uni ON sp.w1 = uni.w
  CROSS JOIN v
)
SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       round((-sum(lp))::DOUBLE / count(*), 6) AS avg_nll
FROM sc GROUP BY doc_id ORDER BY doc_id
"""


def q_bitext_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (similarity.bitext_margin_pairs — the
    Artetxe & Schwenk ratio-margin criterion, LASER/CCMatrix).  Sides
    are the even/odd vec_id halves of the embedding table (< 200), a
    deterministic stand-in for two monolingual corpora.  Two parallel
    pairs are PLANTED by cloning a vector across sides (src 9400000 =
    v(1) pairs with tgt 1; tgt 9400001 = v(0) pairs with src 0), so
    the contract row verifies both the forward-best selection and the
    mutual (backward-best intersection) flag on known ground truth —
    with k=4 neighborhoods the clones score margin ≈ 2 while natural
    best pairs in this isotropic synthetic corpus sit near 1."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = e.filter(F.col("vec_id") < 200)
    plant_src = e.filter(F.col("vec_id") == 1).select(
        F.lit(9400000).cast("long").alias("vec_id"), "embedding"
    )
    plant_tgt = e.filter(F.col("vec_id") == 0).select(
        F.lit(9400001).cast("long").alias("vec_id"), "embedding"
    )
    src = base.filter(F.col("vec_id") % 2 == 0).unionByName(plant_src)
    tgt = base.filter(F.col("vec_id") % 2 == 1).unionByName(plant_tgt)
    return similarity.bitext_margin_pairs(
        src, tgt, k=4, margin_threshold=1.2
    ).orderBy("src_id")


SQL_BITEXT_PAIRS = """
WITH raw AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 200
), src AS (
  SELECT vec_id AS src_id, v AS sv FROM raw WHERE vec_id % 2 = 0
  UNION ALL
  SELECT 9400000::BIGINT, embedding::DOUBLE[] FROM embeddings WHERE vec_id = 1
), tgt AS (
  SELECT vec_id AS tgt_id, v AS tv FROM raw WHERE vec_id % 2 = 1
  UNION ALL
  SELECT 9400001::BIGINT, embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0
), scored AS (
  SELECT src_id, tgt_id,
         CAST(round(round(list_inner_product(sv, tv) /
                (sqrt(list_inner_product(sv, sv)) *
                 sqrt(list_inner_product(tv, tv))), 6) * 1e6, 0) AS BIGINT)
           AS ci
  FROM src CROSS JOIN tgt
), ranked AS (
  SELECT *,
    row_number() OVER (PARTITION BY src_id ORDER BY ci DESC, tgt_id) AS rf,
    row_number() OVER (PARTITION BY tgt_id ORDER BY ci DESC, src_id) AS rb
  FROM scored
), fwd AS (
  SELECT src_id, CAST(sum(ci) AS BIGINT) AS fwd_sum
  FROM ranked WHERE rf <= 4 GROUP BY src_id
), bwd AS (
  SELECT tgt_id, CAST(sum(ci) AS BIGINT) AS bwd_sum
  FROM ranked WHERE rb <= 4 GROUP BY tgt_id
), margins AS (
  SELECT s.src_id, s.tgt_id,
         s.ci / 1000000.0 AS cosine_sim,
         round(CAST(s.ci * 8 AS DOUBLE)
               / CAST(f.fwd_sum + b.bwd_sum AS DOUBLE), 6) AS margin
  FROM scored s
  JOIN fwd f USING (src_id)
  JOIN bwd b USING (tgt_id)
), best AS (
  SELECT *,
    row_number() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id)
      AS bf,
    row_number() OVER (PARTITION BY tgt_id ORDER BY margin DESC, src_id)
      AS bb
  FROM margins
)
SELECT src_id, tgt_id, cosine_sim, margin, (bb = 1) AS mutual
FROM best WHERE bf = 1 AND margin > 1.2 ORDER BY src_id
"""


_SUBSTR_FIXTURES = [
    (
        9200001,
        "unique preamble one two three the quick brown fox jumps over "
        "the lazy dog near riverbank nine tail alpha end",
    ),
    (
        9200002,
        "different opening words here the quick brown fox jumps over "
        "the lazy dog near riverbank nine other closing text",
    ),
    (
        9200003,
        "start marker alpha beta gamma delta epsilon zeta eta theta "
        "iota kappa middle filler words alpha beta gamma delta epsilon "
        "zeta eta theta iota kappa finish",
    ),
]


def q_substring_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level duplicate spans (Lee et al. suffix-array
    dedup, re-expressed as the distributed sorted-shingle-table shape:
    dedup.substring_spans).  Corpus = documents < 150 plus three planted
    fixtures: a 12-token passage shared verbatim by two otherwise-unique
    docs (cross-doc span, exact extent in both) and a doc repeating a
    10-token passage internally (two disjoint spans)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150).select(
        "doc_id", "text"
    )
    fixtures = spark.createDataFrame(
        _SUBSTR_FIXTURES, "doc_id: long, text: string"
    )
    return (
        dedup.substring_spans(d.unionByName(fixtures), k=8)
        .select(
            "doc_id",
            F.col("start_tok").cast("long").alias("start_tok"),
            F.col("end_tok").cast("long").alias("end_tok"),
            F.col("span_tokens").cast("long").alias("span_tokens"),
        )
        .orderBy("doc_id", "start_tok")
    )


SQL_SUBSTRING_DUP = rf"""
WITH base AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 150
  UNION ALL
  SELECT * FROM (VALUES
    (9200001, 'unique preamble one two three the quick brown fox jumps over the lazy dog near riverbank nine tail alpha end'),
    (9200002, 'different opening words here the quick brown fox jumps over the lazy dog near riverbank nine other closing text'),
    (9200003, 'start marker alpha beta gamma delta epsilon zeta eta theta iota kappa middle filler words alpha beta gamma delta epsilon zeta eta theta iota kappa finish')
  ) AS v(doc_id, text)
), d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+') AS t
  FROM base
), p AS (
  SELECT doc_id, i - 1 AS pos,
         {_H60.format(x="array_to_string(t[i:i+7], ' ')")} AS sh
  FROM d, UNNEST(range(1, len(t) - 8 + 2)) AS r(i)
  WHERE len(t) >= 8
), dup AS (
  SELECT sh FROM p GROUP BY sh HAVING count(*) >= 2
), hits AS (
  SELECT p.doc_id, p.pos FROM p JOIN dup USING (sh)
), runs AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM hits
)
SELECT doc_id, min(pos)::BIGINT AS start_tok,
       (max(pos) + 8)::BIGINT AS end_tok,
       (max(pos) - min(pos) + 8)::BIGINT AS span_tokens
FROM runs GROUP BY doc_id, grp
ORDER BY doc_id, start_tok
"""


# Planted prefix-filter fixtures: one pair exactly AT the 0.6 boundary
# (6 shared of 10 union — '>=' must keep it) and one pair well below
# (4/12 ≈ 0.33 — must be dropped even though the docs share prefix
# tokens). Tokens are nonsense stems so they can't collide with corpus
# vocabulary.
_PFX_FIXTURES = [
    (9300001, "zqpa zqpb zqpc zqpd zqpe zqpf zqpg zqph"),
    (9300002, "zqpa zqpb zqpc zqpd zqpe zqpf zqxg zqxh"),
    (9300003, "zqpa zqpb zqpc zqpd zzm1 zzm2 zzm3 zzm4"),
]


def q_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-threshold set-similarity self-join via prefix filtering
    (dedup.prefix_filter_pairs, PPJoin-family): every pair with token
    Jaccard ≥ 3/5, zero recall loss — the lossless counterpart to
    minhash_lsh.  Membership decided by integer cross-multiplication
    (5·shared ≥ 3·union), never a float compare; the DuckDB oracle runs
    the all-pairs shared-token join, so a hash match proves the prefix
    filter dropped NOTHING.  Fixtures plant an exactly-at-boundary pair
    (kept) and a below-threshold pair (dropped)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150).select(
        "doc_id", "text"
    )
    fixtures = spark.createDataFrame(
        _PFX_FIXTURES, "doc_id: long, text: string"
    )
    return (
        dedup.prefix_filter_pairs(d.unionByName(fixtures), threshold=(3, 5))
        .select(
            "doc_a",
            "doc_b",
            F.col("shared").cast("long").alias("shared"),
            "jaccard",
        )
        .orderBy("doc_a", "doc_b")
    )


SQL_PREFIX_JACCARD = r"""
WITH base AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 150
  UNION ALL
  SELECT * FROM (VALUES
    (9300001, 'zqpa zqpb zqpc zqpd zqpe zqpf zqpg zqph'),
    (9300002, 'zqpa zqpb zqpc zqpd zqpe zqpf zqxg zqxh'),
    (9300003, 'zqpa zqpb zqpc zqpd zzm1 zzm2 zzm3 zzm4')
  ) AS v(doc_id, text)
), toks AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)),
                                        '[ \t\n\x0b\f\r]+')) AS tok
    FROM base
  ) WHERE tok <> ''
), sizes AS (
  SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id
), shr AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, shared,
       round(shared / (sa.n + sb.n - shared), 4) AS jaccard
FROM shr
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE 5 * shared >= 3 * (sa.n + sb.n - shared)
ORDER BY doc_a, doc_b
"""


def _synthetic_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five synthetic turns per document (user / assistant ×3 identical
    — the planted run / tool), so every conversation exercises both a
    collapse and role-change run boundaries."""
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        F.concat(F.lit("conv-"), F.col("doc_id").cast("string")).alias(
            "conv_id"
        ),
        F.substring("text", 1, 120).alias("t0"),
        F.substring("text", 121, 120).alias("t1"),
        F.concat(F.lit("result: "), F.substring("text", 241, 60)).alias("t2"),
    )

    def turn(idx: int, role: str, col: str):
        return F.struct(
            F.lit(idx).alias("turn_idx"),
            F.lit(role).alias("role"),
            F.col(col).alias("text"),
        )

    return base.select(
        "conv_id",
        F.explode(
            F.array(
                turn(0, "user", "t0"),
                turn(1, "assistant", "t1"),
                turn(2, "assistant", "t1"),
                turn(3, "assistant", "t1"),
                turn(4, "tool", "t2"),
            )
        ).alias("s"),
    ).select("conv_id", "s.turn_idx", "s.role", "s.text")


def q_turn_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length collapsing of consecutive repeated transcript turns
    (mix.turn_dedup) — the stuck-agent retry-loop cleanup — over the
    planted-run synthetic turn corpus."""
    return mix.turn_dedup(_synthetic_turns(spark, sf_dir)).orderBy(
        "conv_id", "turn_idx"
    )


_SQL_TURN_DEDUP_INNER = r"""
WITH turns AS (
  SELECT 'conv-' || doc_id AS conv_id, 0 AS turn_idx, 'user' AS role,
         substr(text, 1, 120) AS text FROM documents
  UNION ALL SELECT 'conv-' || doc_id, 1, 'assistant',
         substr(text, 121, 120) FROM documents
  UNION ALL SELECT 'conv-' || doc_id, 2, 'assistant',
         substr(text, 121, 120) FROM documents
  UNION ALL SELECT 'conv-' || doc_id, 3, 'assistant',
         substr(text, 121, 120) FROM documents
  UNION ALL SELECT 'conv-' || doc_id, 4, 'tool',
         'result: ' || substr(text, 241, 60) FROM documents
), flagged AS (
  SELECT *,
         CASE WHEN lag(role) OVER w IS NULL
                OR lag(role) OVER w <> role
                OR lag(text) OVER w <> text
              THEN 1 ELSE 0 END AS is_new
  FROM turns WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
), runs AS (
  SELECT *, sum(is_new) OVER (PARTITION BY conv_id ORDER BY turn_idx
                              ROWS UNBOUNDED PRECEDING) AS run_id
  FROM flagged
)
SELECT conv_id, min(turn_idx) AS turn_idx, min(role) AS role,
       min(text) AS text, count(*) AS n_repeats
FROM runs GROUP BY conv_id, run_id
"""

SQL_TURN_DEDUP = _SQL_TURN_DEDUP_INNER + "ORDER BY conv_id, turn_idx"


def q_stream_turn_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of turn_dedup (custom stateful operator —
    applyInPandasWithState run-length collapse).  Emitted = runs closed
    by a later differing turn; each conversation's trailing run stays
    open in state, so the oracle is the batch result minus every
    conversation's LAST run."""
    import shutil

    from engine.spark import streaming

    src = tempfile.mkdtemp(prefix="turndedup_src_")
    _synthetic_turns(spark, sf_dir).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    ckpt = tempfile.mkdtemp(prefix="turndedup_ckpt_")
    sink = f"stream_turn_dedup_{uuid.uuid4().hex[:8]}"
    out = streaming.stream_turn_dedup(spark, src, ckpt, sink_table=sink)
    shutil.rmtree(ckpt, ignore_errors=True)
    return out.orderBy("conv_id", "turn_idx")


SQL_STREAM_TURN_DEDUP = (
    "SELECT * FROM (" + _SQL_TURN_DEDUP_INNER + """)
QUALIFY turn_idx < max(turn_idx) OVER (PARTITION BY conv_id)
ORDER BY conv_id, turn_idx
"""
)


def q_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-ordered training-shard assignment
    (mix.shard_shuffle): shard = portable_hash(seed:id) mod 16, pos =
    rank of the hash within the shard — reproducible across reruns,
    cluster sizes AND engines (the whole permutation is value-checked
    against DuckDB)."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    return (
        mix.shard_shuffle(d, n_shards=16)
        .select("doc_id", "shard", F.col("pos").cast("long").alias("pos"))
        .orderBy("shard", "pos")
    )


SQL_SHARD_SHUFFLE = f"""
WITH k AS (
  SELECT doc_id,
         {_H60.format(x="'shuf:' || doc_id::VARCHAR")} AS key
  FROM documents
)
SELECT doc_id, (key % 16)::INT AS shard,
       row_number() OVER (PARTITION BY key % 16 ORDER BY key, doc_id)
         AS pos
FROM k ORDER BY shard, pos
"""


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-0.5 source mixing (mix.mixture_sample): per-source
    keep rate sqrt(min_count/n_s), decided by the portable hash — only
    IEEE-exact arithmetic (sqrt, binary-power division), so the kept
    set is byte-identical across engines.  The fixture sources are
    perfectly balanced (rate = 1 everywhere — a vacuous check), so the
    query derives a 70/20/10 skewed source tier: web keeps ~sqrt(1/7),
    books ~sqrt(1/2), code everything."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 10 < 7, F.lit("web"))
        .when(F.col("doc_id") % 10 < 9, F.lit("books"))
        .otherwise(F.lit("code"))
        .alias("source"),
    )
    return mix.mixture_sample(d).select("doc_id", "source").orderBy("doc_id")


SQL_MIXTURE_SAMPLE = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 < 7 THEN 'web'
              WHEN doc_id % 10 < 9 THEN 'books'
              ELSE 'code' END AS source
  FROM documents
), c AS (
  SELECT source, count(*) AS n_src FROM d GROUP BY source
), m AS (SELECT min(n_src) AS min_n FROM c),
r AS (
  SELECT source, sqrt(min_n::DOUBLE / n_src) AS keep_rate FROM c, m
)
SELECT d.doc_id, d.source
FROM d JOIN r USING (source)
WHERE {_H60.format(x="'mix:' || d.doc_id::VARCHAR")}
        / 1152921504606846976.0 < r.keep_rate
ORDER BY d.doc_id
"""


# ------------------------------------------------- conversation analytics
# Shared synthetic multi-turn derivation with role/tool/ts — the full
# input_hint shape (conv_id, turn_idx, role, text, tool, ts), rebuilt
# identically by the DuckDB CTE below.  Epoch base 1767225600 =
# 2026-01-01T00:00:00Z; ts = base + doc_id*97 + turn_idx*13 seconds.

_CONV_EPOCH = 1_767_225_600


def _synthetic_turns_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_synthetic_turns plus tool + ts columns: turn 4 is a tool turn
    whose tool alternates browser/pdf_reader by doc parity; timestamps
    are integer-second arithmetic so epoch maths is engine-exact."""
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.concat(F.lit("conv-"), F.col("doc_id").cast("string")).alias(
            "conv_id"
        ),
        F.substring("text", 1, 120).alias("t0"),
        F.substring("text", 121, 120).alias("t1"),
        F.concat(F.lit("result: "), F.substring("text", 241, 60)).alias("t2"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("browser"))
        .otherwise(F.lit("pdf_reader"))
        .alias("tool4"),
    )

    def turn(idx: int, role: str, col: str, tool):
        return F.struct(
            F.lit(idx).alias("turn_idx"),
            F.lit(role).alias("role"),
            F.col(col).alias("text"),
            (F.lit(tool) if isinstance(tool, str) else tool).alias("tool"),
        )

    ex = base.select(
        "doc_id",
        "conv_id",
        F.explode(
            F.array(
                turn(0, "user", "t0", ""),
                turn(1, "assistant", "t1", ""),
                turn(2, "assistant", "t1", ""),
                turn(3, "assistant", "t1", ""),
                turn(4, "tool", "t2", F.col("tool4")),
            )
        ).alias("s"),
    )
    return ex.select(
        "conv_id",
        "s.turn_idx",
        "s.role",
        "s.text",
        "s.tool",
        F.timestamp_seconds(
            F.lit(_CONV_EPOCH)
            + F.col("doc_id") * 97
            + F.col("s.turn_idx") * 13
        ).alias("ts"),
    )


_SQL_TURNS_FULL = """
WITH turns AS (
  SELECT 'conv-' || doc_id AS conv_id, doc_id, 0 AS turn_idx,
         'user' AS role, substr(text, 1, 120) AS text, '' AS tool
  FROM documents
  UNION ALL SELECT 'conv-' || doc_id, doc_id, 1, 'assistant',
         substr(text, 121, 120), '' FROM documents
  UNION ALL SELECT 'conv-' || doc_id, doc_id, 2, 'assistant',
         substr(text, 121, 120), '' FROM documents
  UNION ALL SELECT 'conv-' || doc_id, doc_id, 3, 'assistant',
         substr(text, 121, 120), '' FROM documents
  UNION ALL SELECT 'conv-' || doc_id, doc_id, 4, 'tool',
         'result: ' || substr(text, 241, 60),
         CASE WHEN doc_id % 2 = 0 THEN 'browser' ELSE 'pdf_reader' END
  FROM documents
), full_t AS (
  SELECT conv_id, turn_idx, role, text, tool,
         1767225600 + doc_id * 97 + turn_idx * 13 AS sec
  FROM turns
)
"""

_SQL_RENDERED = (
    "'<|' || role || CASE WHEN tool <> '' THEN ':' || tool ELSE '' END"
    " || '|>' || chr(10) || text || chr(10) || '<|end|>'"
)


def q_conv_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation rollup (conversation.conv_stats) — one
    partial-aggregating shuffle over the full transcript shape."""
    return conversation.conv_stats(
        _synthetic_turns_full(spark, sf_dir)
    ).orderBy("conv_id")


SQL_CONV_STATS = _SQL_TURNS_FULL + """
SELECT conv_id,
       count(*) AS n_turns,
       sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)::BIGINT AS n_user,
       sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)::BIGINT
         AS n_assistant,
       sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END)::BIGINT AS n_tool,
       sum(CASE WHEN tool <> '' THEN 1 ELSE 0 END)::BIGINT AS n_tool_calls,
       count(DISTINCT CASE WHEN tool <> '' THEN tool END)::BIGINT AS n_tools,
       sum(length(text))::BIGINT AS total_chars,
       max(length(text))::BIGINT AS max_turn_chars,
       (max(sec) - min(sec))::BIGINT AS duration_s
FROM full_t GROUP BY conv_id ORDER BY conv_id
"""


def q_role_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alternation-contract validation (conversation.role_violations):
    the synthetic corpus plants an assistant-assistant-assistant run,
    so turns 2 and 3 of every conversation are violations."""
    return conversation.role_violations(
        _synthetic_turns_full(spark, sf_dir)
    ).orderBy("conv_id", "turn_idx")


SQL_ROLE_VIOLATIONS = _SQL_TURNS_FULL + """
SELECT conv_id, turn_idx, role,
       lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
         AS prev_role
FROM full_t
QUALIFY role = prev_role
ORDER BY conv_id, turn_idx
"""


def q_chat_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template rendering (conversation.chat_render): codegen
    per-turn render + the two-phase chunked ordered concat of
    assemble_docs — bounded reducer memory on skewed conversations."""
    return conversation.chat_render(
        _synthetic_turns_full(spark, sf_dir)
    ).orderBy("conv_id")


SQL_CHAT_RENDER = _SQL_TURNS_FULL + f"""
SELECT conv_id,
       string_agg({_SQL_RENDERED}, chr(10) ORDER BY turn_idx) AS chat
FROM full_t GROUP BY conv_id ORDER BY conv_id
"""


def q_sft_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window SFT assembly (conversation.sft_examples, k=3):
    prompt = previous ≤3 turns in the chat template, one example per
    assistant turn — the ROWS-bounded-frame shape that holds at 10^12
    turns."""
    return conversation.sft_examples(
        _synthetic_turns_full(spark, sf_dir), k=3
    ).orderBy("conv_id", "turn_idx")


SQL_SFT_EXAMPLES = _SQL_TURNS_FULL + f"""
, r AS (
  SELECT conv_id, turn_idx, role, text,
         {_SQL_RENDERED} AS rendered
  FROM full_t
), wnd AS (
  SELECT conv_id, turn_idx, role, text AS completion,
         string_agg(rendered, chr(10)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS prompt,
         count(*) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS n_ctx
  FROM r
)
SELECT conv_id, turn_idx, prompt, completion, n_ctx::INT AS n_ctx_turns
FROM wnd WHERE role = 'assistant' AND n_ctx > 0
ORDER BY conv_id, turn_idx
"""


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE session_window aggregation (conversation.session_window_agg)
    — Spark's dedicated merging-sessions path, the same expression that
    runs under a streaming watermark.  Boundary semantics pinned by the
    oracle: a gap strictly GREATER than 30 min opens a new session
    (an event landing exactly on the previous window's end merges —
    same rule as sessionize's lag test, pinned by a unit test); bounds
    emitted as unix_micros integers so no float epoch reaches the
    compare."""
    return conversation.session_window_agg(
        _t(spark, sf_dir, "events"), gap="30 minutes"
    ).orderBy("user_id", "start_us")


SQL_SESSION_WINDOW = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, value FROM events
), f AS (
  SELECT user_id, us, value,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us)
), s AS (
  SELECT *, sum(is_new) OVER (
    PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
  FROM f
)
SELECT user_id, min(us) AS start_us, max(us) + 1800000000 AS end_us,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS value_sum
FROM s GROUP BY user_id, sid
ORDER BY user_id, start_us
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based batch sessionization (conversation.sessionize, 30-min
    gap) over the events stream — lag/cumsum window and session rollup
    share ONE hash partitioning on user_id (plan-asserted)."""
    e = _t(spark, sf_dir, "events")
    return conversation.sessionize(
        e, gap_s=1800, exact_value_sum=True
    ).orderBy("user_id", "session_idx")


SQL_SESSIONIZE = """
WITH e2 AS (
  -- floor(), not ::BIGINT: DuckDB's cast rounds sub-second epochs,
  -- Spark's unix_timestamp floors them
  SELECT user_id, event_id, value,
         floor(epoch(ts))::BIGINT AS sec
  FROM events
), f AS (
  SELECT user_id, event_id, value, sec,
         CASE WHEN lag(sec) OVER w IS NULL
                OR sec - lag(sec) OVER w > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM e2
  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
), s AS (
  SELECT *, sum(is_new) OVER (
    PARTITION BY user_id ORDER BY sec, event_id
    ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM f
)
SELECT user_id, session_idx::BIGINT AS session_idx,
       min(sec)::BIGINT AS session_start,
       max(sec)::BIGINT AS session_end,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2)
         AS total_value,
       (max(sec) - min(sec))::BIGINT AS duration_s
FROM s GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""


def q_tool_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tool invocation stats (conversation.tool_usage) — two-stage
    distinct aggregate under a low-cardinality group key."""
    return conversation.tool_usage(
        _synthetic_turns_full(spark, sf_dir)
    ).orderBy("tool")


SQL_TOOL_USAGE = _SQL_TURNS_FULL + """
SELECT tool, count(*) AS n_calls,
       count(DISTINCT conv_id)::BIGINT AS n_convs,
       sum(length(text))::BIGINT AS total_chars,
       max(length(text))::BIGINT AS max_chars
FROM full_t WHERE role = 'tool' AND tool <> ''
GROUP BY tool ORDER BY tool
"""


def q_table_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markdown-table → relational-cell extraction (text.table_cells)
    over a deterministically constructed table-bearing markdown column
    (both engines build the identical input, then extract with
    independent split/filter pipelines)."""
    d = _t(spark, sf_dir, "documents")
    nl = F.lit("\n")
    md = F.concat(
        F.lit("# T"), F.col("doc_id").cast("string"), nl,
        F.lit("| name | value |"), nl,
        F.lit("| --- | --- |"), nl,
        F.lit("| "), F.substring("text", 1, 8), F.lit(" | "),
        (F.col("doc_id") % 100).cast("string"), F.lit(" |"), nl,
        F.lit("| "), F.substring("text", 9, 8), F.lit(" | "),
        ((F.col("doc_id") * 7) % 100).cast("string"), F.lit(" |"), nl,
        F.lit("tail prose"),
    )
    turns = d.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias(
            "conv_id"
        ),
        F.lit(0).alias("turn_idx"),
        md.alias("markdown"),
    )
    return etext.table_cells(turns).orderBy("conv_id", "line_no", "col_idx")


SQL_TABLE_CELLS = """
WITH md AS (
  SELECT 'doc-' || doc_id AS conv_id, 0 AS turn_idx,
         '# T' || doc_id || chr(10) ||
         '| name | value |' || chr(10) ||
         '| --- | --- |' || chr(10) ||
         '| ' || substr(text, 1, 8) || ' | ' || (doc_id % 100) || ' |'
           || chr(10) ||
         '| ' || substr(text, 9, 8) || ' | ' || ((doc_id * 7) % 100)
           || ' |' || chr(10) ||
         'tail prose' AS markdown
  FROM documents
), lines AS (
  SELECT conv_id, turn_idx,
         unnest(str_split(markdown, chr(10))) AS line,
         generate_subscripts(str_split(markdown, chr(10)), 1) AS line_no
  FROM md
), t AS (
  SELECT * FROM lines
  WHERE regexp_matches(line, '^\\|.*\\|$')
    AND NOT regexp_matches(line, '^\\|[-| ]+\\|$')
), cells AS (
  SELECT conv_id, turn_idx, line_no,
         unnest(str_split(line, '|')[2:-2]) AS c,
         generate_subscripts(str_split(line, '|')[2:-2], 1) AS col_idx
  FROM t
)
SELECT conv_id, turn_idx, line_no, col_idx, trim(c) AS cell
FROM cells ORDER BY conv_id, line_no, col_idx
"""


def q_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index maintenance without rebuild
    (similarity.ivf_incremental_topk): quantizer trained on the frozen
    corpus (vec_id >= 100) only; the new batch (vec_id < 100) joins the
    inverted lists via a zero-shuffle assignment projection.  The
    DuckDB twin retrains the same frozen quantizer on the same subset
    and must match value-exactly."""
    e = _t(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") >= 100)
    batch = e.filter(F.col("vec_id") < 100)
    out = similarity.ivf_incremental_topk(
        corpus, batch, dim=64, n_centroids=8, n_probe=2, n_queries=8, k=5
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


SQL_IVF_INCREMENTAL = f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
corpus AS (SELECT * FROM base WHERE vec_id >= 100),
seeds AS (
  SELECT vec_id AS cid, v AS c FROM corpus ORDER BY vec_id LIMIT 8
),
cl AS (
  SELECT list(struct_pack(cid := cid, c := c) ORDER BY cid) AS cents
  FROM seeds
),
a1 AS (SELECT vec_id, v, {_dk_assign('v')} AS cid FROM corpus, cl),
dims AS (
  SELECT cid, i AS d, v[i] AS x FROM a1, UNNEST(range(1, 65)) r(i)
),
means AS (SELECT cid, d, round(avg(x), 6) AS m FROM dims GROUP BY cid, d),
cent2 AS (SELECT cid, list(m ORDER BY d) AS c FROM means GROUP BY cid),
cent2b AS (
  SELECT s.cid, coalesce(c2.c, s.c) AS c
  FROM seeds s LEFT JOIN cent2 c2 USING (cid)
),
cl2 AS (
  SELECT list(struct_pack(cid := cid, c := c) ORDER BY cid) AS cents
  FROM cent2b
),
a2 AS (SELECT vec_id, v, {_dk_assign('v')} AS cid FROM base, cl2),
probes AS (
  SELECT vec_id AS query_id, v AS qv,
         unnest(list_transform(
           list_sort(list_transform(cents, s ->
             {{'dist': 1.0 - {_dk_cos('v', 's.c')}, 'cid': s.cid}}))[1:2],
           t -> t.cid)) AS cid
  FROM base, cl2 WHERE vec_id < 8
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         round({_dk_cos('p.qv', 'a.v')}, 6) AS cosine_sim
  FROM probes p JOIN a2 a ON a.cid = p.cid AND a.vec_id != p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 5
"""


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-candidate statistics (text.bpe_merge_stats): top-20
    adjacent pre-token pairs with a fully deterministic order.  The
    DuckDB twin re-derives pairs via a lead() window over token
    ordinals — an independent pairing algorithm."""
    d = _t(spark, sf_dir, "documents")
    return etext.bpe_merge_stats(d, k=20)


SQL_BPE_MERGES = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text,
           '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0b\f\r]')) AS tok,
         generate_subscripts(regexp_extract_all(text,
           '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0b\f\r]'), 1) AS pos
  FROM documents
), pairs AS (
  SELECT doc_id, tok AS left_tok,
         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS right_tok
  FROM toks
)
SELECT left_tok, right_tok, count(*) AS cnt
FROM pairs WHERE right_tok IS NOT NULL
GROUP BY left_tok, right_tok
ORDER BY cnt DESC, left_tok ASC, right_tok ASC LIMIT 20
"""


def q_transcript_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite transcript-corpus curation
    (conversation.transcript_curation): run-collapse repeat ratio +
    alternation violations + SFT-usability gates in one conv-keyed
    window + rollup.  Planted conversations fire every drop reason
    (too_short / no_assistant / repetitive); the synthetic corpus
    itself (repeat_ratio 0.4 from the planted assistant run) stays
    under the 0.5 gate, so the bulk keeps."""
    base = _synthetic_turns_full(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "text"
    )
    planted = spark.createDataFrame(
        [
            ("planted-short", 0, "user", "hi"),
            ("planted-noasst", 0, "user", "a"),
            ("planted-noasst", 1, "tool", "b"),
            ("planted-repeat", 0, "user", "q"),
            *[("planted-repeat", i, "assistant", "same") for i in range(1, 6)],
        ],
        "conv_id: string, turn_idx: int, role: string, text: string",
    )
    return conversation.transcript_curation(
        base.unionByName(planted), min_turns=2, max_repeat_ratio=0.5
    ).orderBy("conv_id")


SQL_TRANSCRIPT_CURATION = _SQL_TURNS_FULL + """
, planted AS (
  SELECT * FROM (VALUES
    ('planted-short', 0, 'user', 'hi'),
    ('planted-noasst', 0, 'user', 'a'),
    ('planted-noasst', 1, 'tool', 'b'),
    ('planted-repeat', 0, 'user', 'q'),
    ('planted-repeat', 1, 'assistant', 'same'),
    ('planted-repeat', 2, 'assistant', 'same'),
    ('planted-repeat', 3, 'assistant', 'same'),
    ('planted-repeat', 4, 'assistant', 'same'),
    ('planted-repeat', 5, 'assistant', 'same')
  ) v(conv_id, turn_idx, role, text)
), allt AS (
  SELECT conv_id, turn_idx, role, text FROM full_t
  UNION ALL SELECT conv_id, turn_idx, role, text FROM planted
), flagged AS (
  SELECT conv_id, role,
         CASE WHEN lag(role) OVER w IS NULL
                OR lag(role) OVER w <> role
                OR lag(text) OVER w <> text
              THEN 1 ELSE 0 END AS is_new_run,
         CASE WHEN role = lag(role) OVER w THEN 1 ELSE 0 END AS viol
  FROM allt WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
), stats AS (
  SELECT conv_id, count(*) AS n_turns,
         sum(is_new_run)::BIGINT AS n_runs,
         sum(viol)::BIGINT AS n_violations,
         max(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS has_asst
  FROM flagged GROUP BY conv_id
), scored AS (
  SELECT conv_id, n_turns, n_runs,
         round(1.0 - n_runs::DOUBLE / n_turns, 6) AS repeat_ratio,
         n_violations,
         CASE WHEN n_turns < 2 THEN 'too_short'
              WHEN has_asst = 0 THEN 'no_assistant'
              WHEN round(1.0 - n_runs::DOUBLE / n_turns, 6) > 0.5
                THEN 'repetitive' END AS drop_reason
  FROM stats
)
SELECT conv_id, n_turns, n_runs, repeat_ratio, n_violations,
       drop_reason IS NULL AS keep, drop_reason
FROM scored ORDER BY conv_id
"""


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation as a first-class op: per-query recall@5 of
    the LSH ANN against brute-force ground truth
    (similarity.ann_recall).  The oracle recomputes BOTH pipelines —
    the recall numbers themselves are value-checked cross-engine."""
    e = _t(spark, sf_dir, "embeddings")
    truth = similarity.brute_force_topk(e, n_queries=8, k=5)
    approx = similarity.lsh_ann_topk(
        e, dim=64, n_queries=8, k=5, n_planes=4
    )
    return similarity.ann_recall(truth, approx).orderBy("query_id")


# Composes the two ANN oracles verbatim: ground truth and approximate
# result are both re-derived, then joined for per-query recall.
SQL_ANN_RECALL = f"""
WITH truth AS ({SQL_EMBEDDING_TOPK}), approx AS ({SQL_LSH_ANN})
SELECT t.query_id, count(*) AS n_true,
       sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_hit,
       round(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0
                 END)::DOUBLE / count(*), 6) AS recall
FROM truth t LEFT JOIN approx a
  ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
GROUP BY t.query_id ORDER BY t.query_id
"""


def q_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-aware retrieval evaluation (similarity.retrieval_metrics):
    per-query NDCG@5 / MRR / recall@5 of the LSH ANN against
    brute-force ground truth.  Complements ann_recall (rank-blind): an
    ANN that finds the right neighbors in the wrong order scores the
    same recall but lower NDCG.  Gain and reciprocal-rank tables are
    Python-precomputed integer micro-units inlined as literals on BOTH
    engines — no libm log2 in either plan."""
    e = _spread(spark, _t(spark, sf_dir, "embeddings"))
    truth = similarity.brute_force_topk(e, n_queries=8, k=5)
    system = similarity.lsh_ann_topk(
        e, dim=64, n_queries=8, k=5, n_planes=4
    )
    return similarity.retrieval_metrics(truth, system, k=5).orderBy(
        "query_id"
    )


_NDCG_W = similarity.dcg_weight_micros(5)
_NDCG_PREFIX = [0]
for _w in _NDCG_W:
    _NDCG_PREFIX.append(_NDCG_PREFIX[-1] + _w)
_NDCG_RR = similarity.rr_micros(5)

# Composes the two ANN oracles verbatim (as SQL_ANN_RECALL does), then
# scores the system ranking with the SAME precomputed integer gain /
# reciprocal-rank literals the Spark plan inlines.
SQL_RETRIEVAL_NDCG = f"""
WITH truth AS ({SQL_EMBEDDING_TOPK}), sys AS ({SQL_LSH_ANN}),
j AS (
  SELECT s.query_id, s.rank,
         CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS rel
  FROM sys s LEFT JOIN truth t
    ON t.query_id = s.query_id AND t.neighbor_id = s.neighbor_id
  WHERE s.rank <= 5
),
per_sys AS (
  SELECT query_id,
         CAST(sum(CASE WHEN rel = 1 THEN ({_NDCG_W})[rank] ELSE 0 END)
              AS BIGINT) AS dcg_micro,
         min(CASE WHEN rel = 1 THEN rank END) AS first_hit,
         CAST(sum(rel) AS BIGINT) AS n_hit
  FROM j GROUP BY query_id
),
nt AS (
  SELECT query_id, count(*) AS n_true FROM truth GROUP BY query_id
)
SELECT nt.query_id, nt.n_true,
       CAST(COALESCE(p.n_hit, 0) AS BIGINT) AS n_hit,
       round(CAST(COALESCE(p.n_hit, 0) AS DOUBLE) / nt.n_true, 6)
         AS recall,
       round(CAST(COALESCE(p.dcg_micro, 0) AS DOUBLE)
             / (({_NDCG_PREFIX})[LEAST(nt.n_true, 5) + 1]), 6) AS ndcg,
       round(CAST(CASE WHEN p.first_hit IS NOT NULL
                       THEN ({_NDCG_RR})[p.first_hit] ELSE 0 END
                  AS DOUBLE) / 1e6, 6) AS mrr
FROM nt LEFT JOIN per_sys p USING (query_id) ORDER BY query_id
"""


def q_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over two dimensions
    (zorder.zorder_key) — the Delta/Iceberg OPTIMIZE ZORDER BY idea as
    pure codegen bit arithmetic: micro-unit encode, exact-integer
    min-max bucket to 16 bits, shift-or-mask interleave.  The layout
    payoff (2-D box predicates pruning most parquet files via footer
    min/max) is asserted from real footers in tests/test_zorder.py;
    this contract row pins the key arithmetic bit-for-bit."""
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return (
        zorder.zorder_key(e, "value", "user_id")
        .select("event_id", "zkey")
        .orderBy("event_id")
    )


SQL_ZORDER_CLUSTER = """
WITH enc AS (
  SELECT event_id,
         CAST(round(CAST(value AS DOUBLE) * 1e6, 0) AS BIGINT) AS xv,
         CAST(round(CAST(user_id AS DOUBLE) * 1e6, 0) AS BIGINT) AS yv
  FROM events
), mm AS (
  SELECT min(xv) AS minx, max(xv) AS maxx,
         min(yv) AS miny, max(yv) AS maxy FROM enc
), b AS (
  SELECT event_id,
         CAST(((xv - minx) * 65535
               - ((xv - minx) * 65535)
                 % (CASE WHEN maxx = minx THEN 1 ELSE maxx - minx END))
              / (CASE WHEN maxx = minx THEN 1 ELSE maxx - minx END)
              AS BIGINT) AS bx,
         CAST(((yv - miny) * 65535
               - ((yv - miny) * 65535)
                 % (CASE WHEN maxy = miny THEN 1 ELSE maxy - miny END))
              / (CASE WHEN maxy = miny THEN 1 ELSE maxy - miny END)
              AS BIGINT) AS yb
  FROM enc CROSS JOIN mm
), s1 AS (
  SELECT event_id, ((bx | (bx << 8)) & 16711935) AS bx,
         ((yb | (yb << 8)) & 16711935) AS yb FROM b
), s2 AS (
  SELECT event_id, ((bx | (bx << 4)) & 252645135) AS bx,
         ((yb | (yb << 4)) & 252645135) AS yb FROM s1
), s3 AS (
  SELECT event_id, ((bx | (bx << 2)) & 858993459) AS bx,
         ((yb | (yb << 2)) & 858993459) AS yb FROM s2
), s4 AS (
  SELECT event_id, ((bx | (bx << 1)) & 1431655765) AS bx,
         ((yb | (yb << 1)) & 1431655765) AS yb FROM s3
)
SELECT event_id, (bx | (yb << 1)) AS zkey FROM s4 ORDER BY event_id
"""


def q_agent_loops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stuck-agent trajectory detection (conversation.agent_loops):
    longest identical-step run and longest period-2 (A-B-A-B) cycle per
    conversation.  The synthetic transcripts give every conv a built-in
    3-run (turns 1-3 share text+role); two PLANTED convs pin the
    extremes: 'conv-x-loop' repeats one tool call 10 times (max_run
    10), 'conv-x-pingpong' alternates two steps for 8 turns (max_run 1,
    period2_run 8) — both must flag, and the flag thresholds fire via
    different branches."""
    base = _synthetic_turns_full(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "text", "tool"
    )
    loop = spark.range(10).select(
        F.lit("conv-x-loop").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        F.lit("retrying fetch").alias("text"),
        F.lit("browser").alias("tool"),
    )
    pingpong = spark.range(8).select(
        F.lit("conv-x-pingpong").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        F.when(F.col("id") % 2 == 0, F.lit("open page"))
        .otherwise(F.lit("press back"))
        .alias("text"),
        F.lit("browser").alias("tool"),
    )
    allt = base.unionByName(loop).unionByName(pingpong)
    return conversation.agent_loops(allt, min_run=4, min_alt=6).orderBy(
        "conv_id"
    )


def q_stream_agent_loops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of agent_loops (custom stateful operator —
    applyInPandasWithState, O(1) per-conversation state: two signatures
    + five counters).  Update-style emission; the latest emission per
    conversation after the source drains equals the batch operator
    exactly, so it SHARES the batch oracle (SQL_AGENT_LOOPS
    verbatim)."""
    import shutil

    from engine.spark import streaming

    src = tempfile.mkdtemp(prefix="loops_src_")
    base = _synthetic_turns_full(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "text", "tool"
    )
    loop = spark.range(10).select(
        F.lit("conv-x-loop").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        F.lit("retrying fetch").alias("text"),
        F.lit("browser").alias("tool"),
    )
    pingpong = spark.range(8).select(
        F.lit("conv-x-pingpong").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("assistant").alias("role"),
        F.when(F.col("id") % 2 == 0, F.lit("open page"))
        .otherwise(F.lit("press back"))
        .alias("text"),
        F.lit("browser").alias("tool"),
    )
    base.unionByName(loop).unionByName(pingpong).coalesce(
        1
    ).write.mode("overwrite").parquet(src)
    ckpt = tempfile.mkdtemp(prefix="loops_ckpt_")
    sink = f"stream_loops_{uuid.uuid4().hex[:8]}"
    out = streaming.stream_agent_loops(spark, src, ckpt, sink_table=sink)
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(src, ignore_errors=True)  # staged source, drained
    return out.orderBy("conv_id")


SQL_AGENT_LOOPS = _SQL_TURNS_FULL + """
, planted AS (
  SELECT conv_id, turn_idx, role, text, tool FROM full_t
  UNION ALL
  SELECT 'conv-x-loop', CAST(i AS INT), 'assistant', 'retrying fetch',
         'browser' FROM range(10) t(i)
  UNION ALL
  SELECT 'conv-x-pingpong', CAST(i AS INT), 'assistant',
         CASE WHEN i % 2 = 0 THEN 'open page' ELSE 'press back' END,
         'browser' FROM range(8) t(i)
), sigged AS (
  SELECT conv_id, turn_idx,
         md5(role || chr(31) || tool || chr(31) || text) AS sig
  FROM planted
), lagged AS (
  SELECT conv_id, turn_idx,
         CASE WHEN lag(sig) OVER w IS NULL OR sig <> lag(sig) OVER w
              THEN 1 ELSE 0 END AS chg,
         CASE WHEN sig = lag(sig, 2) OVER w THEN 1 ELSE 0 END AS m2
  FROM sigged WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
), grp AS (
  SELECT conv_id, m2, sum(chg) OVER w AS g1, sum(1 - m2) OVER w AS g2
  FROM lagged
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx
               ROWS UNBOUNDED PRECEDING)
), nt AS (
  SELECT conv_id, count(*) AS n_turns FROM grp GROUP BY conv_id
), r1 AS (
  SELECT conv_id, max(len) AS max_run FROM (
    SELECT conv_id, g1, count(*) AS len FROM grp GROUP BY conv_id, g1
  ) GROUP BY conv_id
), r2 AS (
  SELECT conv_id, max(len) AS max_streak FROM (
    SELECT conv_id, g2, count(*) AS len FROM grp WHERE m2 = 1
    GROUP BY conv_id, g2
  ) GROUP BY conv_id
)
SELECT nt.conv_id, nt.n_turns, r1.max_run,
       LEAST(COALESCE(r2.max_streak, 0) + 2, nt.n_turns) AS period2_run,
       (r1.max_run >= 4 OR
        LEAST(COALESCE(r2.max_streak, 0) + 2, nt.n_turns) >= 6)
         AS loop_flag
FROM nt JOIN r1 USING (conv_id) LEFT JOIN r2 USING (conv_id)
ORDER BY conv_id
"""


def q_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC with tie handling (diagnose.roc_auc) — the
    evaluation counterpart of classifier_score.  Deterministic setup:
    score = portable_hash60(text) % 1000 (coarse enough that real ties
    occur in a 500-doc corpus), label = doc_id % 3 = 0, evaluated per
    segment doc_id % 4 — so all four AUC values, including the tie
    correction, are pinned cross-engine.  Never a global row sort: the
    corpus collapses to a per-(segment, score) histogram first (the
    NTILE-trap avoidance the r4 verdict asked for, applied to AUC)."""
    d = _t(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 4).cast("long").alias("segment"),
        (dedup.portable_hash60(F.col("text")) % 1000).alias("score"),
        (F.col("doc_id") % 3 == 0).cast("int").alias("label"),
    )
    return diagnose.roc_auc(
        d, score_col="score", label_col="label", group_col="segment"
    ).orderBy("segment")


# Independent derivation: the oracle uses the rank-sum (Mann–Whitney)
# identity with average ranks over ties instead of the histogram
# running sum — same AUC, different algebra.
SQL_CLASSIFIER_AUC = f"""
WITH scored AS (
  SELECT CAST(doc_id % 4 AS BIGINT) AS segment,
         {_H60.format(x="text")} % 1000 AS score,
         CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS label
  FROM documents
), ranked AS (
  SELECT segment, label,
         avg(rn) OVER (PARTITION BY segment, score) AS avg_rank
  FROM (
    SELECT segment, score, label,
           row_number() OVER (PARTITION BY segment
                              ORDER BY score, label) AS rn
    FROM scored
  )
), agg AS (
  SELECT segment,
         CAST(sum(label) AS BIGINT) AS n_pos,
         CAST(sum(1 - label) AS BIGINT) AS n_neg,
         sum(CASE WHEN label = 1 THEN avg_rank ELSE 0 END) AS r_pos
  FROM ranked GROUP BY segment
)
SELECT segment, n_pos, n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         round((r_pos - n_pos * (n_pos + 1) / 2.0)
               / (CAST(n_pos AS DOUBLE) * n_neg), 6)
       END AS auc
FROM agg ORDER BY segment
"""


def q_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Welch two-sample t-test (diagnose.welch_ttest):
    variant = user parity — an A/B readout whose t/df are pinned
    cross-engine via exact DECIMAL sufficient statistics and a fixed
    IEEE operation order (the grouped_regression discipline)."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.col("user_id") % 2 == 0, F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("variant"),
        "value",
    )
    return diagnose.welch_ttest(
        e, "event_type", "variant", "value"
    ).orderBy("event_type")


SQL_AB_TTEST = """
WITH per AS (
  SELECT event_type,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
         count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS s,
         CAST(sum(CAST(value AS DECIMAL(18,6))
                  * CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,12)) AS ss
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
), piv AS (
  SELECT event_type,
         max(CASE WHEN variant = 'A' THEN n END) AS n_c,
         max(CASE WHEN variant = 'A' THEN s END) AS s_c,
         max(CASE WHEN variant = 'A' THEN ss END) AS ss_c,
         max(CASE WHEN variant = 'B' THEN n END) AS n_t,
         max(CASE WHEN variant = 'B' THEN s END) AS s_t,
         max(CASE WHEN variant = 'B' THEN ss END) AS ss_t
  FROM per GROUP BY event_type
), d AS (
  SELECT event_type, n_c, n_t,
         CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS mean_c,
         CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE) AS mean_t,
         (CAST(ss_c AS DOUBLE)
          - CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE)
            / CAST(n_c AS DOUBLE))
           / (CAST(n_c AS DOUBLE) - 1.0) / CAST(n_c AS DOUBLE) AS se_c,
         (CAST(ss_t AS DOUBLE)
          - CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE)
            / CAST(n_t AS DOUBLE))
           / (CAST(n_t AS DOUBLE) - 1.0) / CAST(n_t AS DOUBLE) AS se_t
  FROM piv WHERE n_c IS NOT NULL AND n_t IS NOT NULL
)
SELECT event_type,
       CAST(n_c AS BIGINT) AS n_c, CAST(n_t AS BIGINT) AS n_t,
       round(mean_c, 6) AS mean_c, round(mean_t, 6) AS mean_t,
       round(mean_t - mean_c, 6) AS diff,
       CASE WHEN n_c >= 2 AND n_t >= 2 AND se_t + se_c > 0.0 THEN
         round((mean_t - mean_c) / sqrt(se_t + se_c), 6) END AS t_stat,
       CASE WHEN n_c >= 2 AND n_t >= 2 AND se_t + se_c > 0.0 THEN
         round(((se_t + se_c) * (se_t + se_c))
               / (se_t * se_t / (CAST(n_t AS DOUBLE) - 1.0)
                  + se_c * se_c / (CAST(n_c AS DOUBLE) - 1.0)), 6)
       END AS dof
FROM d ORDER BY event_type
"""


def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins (diagnose.calibration_bins) over a
    deterministic pseudo-probability (hash of props, micro-unit) and a
    deterministic label — bin boundaries are exact integer
    floor-division on the micro score, so no float boundary can
    disagree across engines."""
    e = _t(spark, sf_dir, "events").select(
        (
            (dedup.portable_hash60(F.col("props")) % 1000000).cast(
                "double"
            )
            / 1e6
        ).alias("score"),
        (F.col("event_id") % 3 == 0).cast("int").alias("label"),
    )
    return diagnose.calibration_bins(e, "score", "label", bins=10).orderBy(
        "bin"
    )


SQL_CALIBRATION_BINS = f"""
WITH scored AS (
  SELECT CAST(round(CAST(({_H60.format(x="props")} % 1000000) AS DOUBLE)
                    / 1e6 * 1e6, 0) AS BIGINT) AS m,
         CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS y
  FROM events
), binned AS (
  SELECT LEAST(CAST(((m * 10) - (m * 10) % 1000000) / 1000000 AS BIGINT),
               9) AS bin, m, y
  FROM scored
)
SELECT bin, count(*) AS n,
       round(CAST(sum(m) AS DOUBLE) / 1e6 / count(*), 6) AS mean_score,
       round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS pos_rate
FROM binned GROUP BY bin ORDER BY bin
"""


def q_stream_sft_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of sft_examples (custom stateful operator —
    applyInPandasWithState bounded context window).  Emission happens AT
    each assistant turn, so the complete stream equals the batch result
    exactly and shares its oracle (SQL_SFT_EXAMPLES verbatim)."""
    import shutil

    from engine.spark import streaming

    src = tempfile.mkdtemp(prefix="sft_src_")
    _synthetic_turns_full(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "text", "tool"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    ckpt = tempfile.mkdtemp(prefix="sft_ckpt_")
    sink = f"stream_sft_{uuid.uuid4().hex[:8]}"
    out = streaming.stream_sft_examples(spark, src, ckpt, sink_table=sink)
    shutil.rmtree(ckpt, ignore_errors=True)
    return out.orderBy("conv_id", "turn_idx")


# The stream emits at each assistant turn — full-stream output is the
# batch result exactly, so the oracle is shared verbatim.
SQL_STREAM_SFT_EXAMPLES = SQL_SFT_EXAMPLES


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-prep vocabulary coverage (text.vocab_coverage): top-500
    corpus vocab with a deterministic (count DESC, token ASC) boundary,
    broadcast back onto the token stream; per-language OOV stats."""
    d = _t(spark, sf_dir, "documents")
    return etext.vocab_coverage(d, vocab_size=500).orderBy("lang")


SQL_VOCAB_COVERAGE = r"""
WITH raw AS (
  SELECT lang,
         unnest(regexp_split_to_array(trim(lower(text)),
                                      '[ \t\n\x0b\f\r]+')) AS tok
  FROM documents
), t2 AS (
  SELECT lang, tok FROM raw WHERE tok <> ''
), vocab AS (
  SELECT tok FROM t2 GROUP BY tok
  ORDER BY count(*) DESC, tok ASC LIMIT 500
)
SELECT t2.lang, count(*) AS total_tokens,
       sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)::BIGINT
         AS oov_tokens,
       round(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)::DOUBLE
               / count(*), 6) AS oov_rate
FROM t2 LEFT JOIN vocab v ON t2.tok = v.tok
GROUP BY t2.lang ORDER BY t2.lang
"""


def q_posting_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction (text.posting_lists): df for every
    term as a partial agg; sorted posting lists ONLY for terms with
    df ≤ 64 (the df-cap semi-join rides BEFORE the collect so a
    stopword never lands on one reducer).  Postings serialize as
    comma-joined id strings for cross-engine hashing."""
    return etext.posting_lists(
        _t(spark, sf_dir, "documents"), max_df=64
    ).orderBy("term")


SQL_POSTING_LISTS = r"""
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)),
                                      '[ \t\n\x0b\f\r]+')) AS term
  FROM documents
),
t2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
df_tab AS (SELECT term, count(*) AS df FROM t2 GROUP BY term),
postings AS (
  SELECT term, string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)
           AS postings
  FROM t2
  WHERE term IN (SELECT term FROM df_tab WHERE df <= 64)
  GROUP BY term
)
SELECT d.term, d.df, p.postings
FROM df_tab d LEFT JOIN postings p ON d.term = p.term
ORDER BY d.term
"""


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (text.dsir_weights): per-doc log ratio
    of an English-target hashed-token LM vs the corpus LM, add-1
    smoothed over 1024 md5-hash buckets.  Per-bucket log-ratios round
    to 6 dp then accumulate as DECIMAL — aggregation-order-proof; both
    LMs are ≤1024-row partial aggs and the ratio table broadcasts."""
    return etext.dsir_weights(
        _t(spark, sf_dir, "documents"),
        F.col("lang") == "en",
        n_buckets=1024,
    ).orderBy("doc_id")


SQL_DSIR_WEIGHTS = r"""
WITH toks AS (
  SELECT doc_id, (lang = 'en') AS is_tgt,
         unnest(regexp_split_to_array(trim(lower(text)),
                                      '[ \t\n\x0b\f\r]+')) AS tok
  FROM documents
),
t2 AS (SELECT doc_id, is_tgt, tok FROM toks WHERE tok <> ''),
bk AS (
  SELECT doc_id, is_tgt,
         ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1024 AS b
  FROM t2
),
doc_counts AS (SELECT doc_id, b, count(*) AS c FROM bk GROUP BY doc_id, b),
lm AS (
  SELECT b, count(*) AS n_src,
         sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS n_tgt
  FROM bk GROUP BY b
),
tot AS (SELECT sum(n_src) AS t_src, sum(n_tgt) AS t_tgt FROM lm),
ratio AS (
  SELECT b,
         round(ln((n_tgt + 1)::DOUBLE / (t_tgt + 1024)::DOUBLE)
               - ln((n_src + 1)::DOUBLE / (t_src + 1024)::DOUBLE),
               6) AS r
  FROM lm CROSS JOIN tot
)
SELECT dc.doc_id,
       CAST(sum(CAST(dc.c AS DECIMAL(20,6)) * CAST(ratio.r AS DECIMAL(20,6)))
            AS DECIMAL(20,6)) AS log_weight
FROM doc_counts dc JOIN ratio USING (b)
GROUP BY dc.doc_id ORDER BY dc.doc_id
"""


def q_apply_changeset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE (lineage.apply_changeset): an op-coded I/U/D
    changeset — derived deterministically from events, with a second
    higher-seq wave overriding part of the first — applied to a
    snapshot.  Last-wins per key resolves as a struct-max partial agg
    (no window over a hot key's history); the merge is ONE outer join.
    The DuckDB twin re-derives last-wins with row_number — independent
    algorithm, identical merged table."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.col("value").cast("decimal(20,6)").alias("value"),
    )
    snap = ev.filter(F.col("event_id") < 3000)
    base = ev.filter(
        (F.col("event_id") >= 1000) & (F.col("event_id") < 4000)
    )
    c1 = base.select(
        "event_id",
        "event_type",
        (F.col("value") + 100).cast("decimal(20,6)").alias("value"),
        F.when(F.col("event_id") % 3 == 0, F.lit("U"))
        .when(F.col("event_id") % 3 == 1, F.lit("D"))
        .otherwise(F.lit("I"))
        .alias("op"),
        F.lit(1).alias("seq"),
    )
    c2 = base.filter(F.col("event_id") % 6 == 0).select(
        "event_id",
        "event_type",
        (F.col("value") + 200).cast("decimal(20,6)").alias("value"),
        F.lit("U").alias("op"),
        F.lit(2).alias("seq"),
    )
    merged = lineage.apply_changeset(
        snap, c1.unionByName(c2), ["event_id"], seq_col="seq", op_col="op"
    )
    return merged.orderBy("event_id")


SQL_APPLY_CHANGESET = r"""
WITH ev AS (
  SELECT event_id, event_type, CAST(value AS DECIMAL(20,6)) AS value
  FROM events
),
snap AS (SELECT * FROM ev WHERE event_id < 3000),
base AS (SELECT * FROM ev WHERE event_id >= 1000 AND event_id < 4000),
c1 AS (
  SELECT event_id, event_type,
         CAST(value + 100 AS DECIMAL(20,6)) AS value,
         CASE WHEN event_id % 3 = 0 THEN 'U'
              WHEN event_id % 3 = 1 THEN 'D' ELSE 'I' END AS op,
         1 AS seq
  FROM base
),
c2 AS (
  SELECT event_id, event_type,
         CAST(value + 200 AS DECIMAL(20,6)) AS value,
         'U' AS op, 2 AS seq
  FROM base WHERE event_id % 6 = 0
),
ch AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2),
latest AS (
  SELECT event_id, event_type, value, op FROM (
    SELECT *, row_number() OVER (
      PARTITION BY event_id
      ORDER BY seq DESC, op DESC, event_type DESC, value DESC) AS rn
    FROM ch
  ) WHERE rn = 1
)
SELECT coalesce(s.event_id, l.event_id) AS event_id,
       CASE WHEN l.op IS NOT NULL THEN l.event_type
            ELSE s.event_type END AS event_type,
       CASE WHEN l.op IS NOT NULL THEN l.value ELSE s.value END AS value
FROM snap s FULL OUTER JOIN latest l ON s.event_id = l.event_id
WHERE l.op IS NULL OR l.op <> 'D'
ORDER BY event_id
"""


def q_context_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prompt-assembly context trimming (conversation.context_trim):
    keep each conversation's longest turn-suffix fitting a 60-token
    budget (final turn always kept) via one conv-keyed window cumsum
    ordered from the end — O(1) reducer state per row."""
    return conversation.context_trim(
        _synthetic_turns_full(spark, sf_dir), budget_tokens=60
    ).orderBy("conv_id", "turn_idx")


SQL_CONTEXT_TRIM = _SQL_TURNS_FULL + r"""
, tok AS (
  SELECT conv_id, turn_idx, role,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text),
                                             '[ \t\n\x0b\f\r]+')) END
           AS n_tokens
  FROM full_t
),
cum AS (
  SELECT conv_id, turn_idx, role, n_tokens,
         sum(n_tokens) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
                             ROWS UNBOUNDED PRECEDING)::BIGINT
           AS suffix_tokens,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx DESC)
           AS pos_from_end
  FROM tok
)
SELECT conv_id, turn_idx, role, n_tokens, suffix_tokens
FROM cum WHERE suffix_tokens <= 60 OR pos_from_end = 1
ORDER BY conv_id, turn_idx
"""


def q_uniform_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact-k uniform sample (diagnose.uniform_sample):
    hash-rank by md5('s0:'||doc_id), keep the 50 smallest — plans as
    TakeOrderedAndProject, reproducible across engines (the sample
    MEMBERSHIP is the value under test)."""
    return (
        diagnose.uniform_sample(
            _t(spark, sf_dir, "documents").select("doc_id", "lang", "source"),
            k=50,
            id_col="doc_id",
        )
        .orderBy("doc_id")
    )


SQL_UNIFORM_SAMPLE = r"""
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source
  FROM documents
  ORDER BY md5('s0:' || doc_id::VARCHAR) ASC, doc_id ASC
  LIMIT 50
) ORDER BY doc_id
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact-k weighted sample without replacement
    (diagnose.weighted_sample, Efraimidis–Spirakis exponential race):
    key = −ln(u)/w with u the portable md5 60-bit hash-uniform and
    w = length(text)+1, keep the 60 smallest — longer docs are
    proportionally likelier, the draw is engine-reproducible, and the
    plan is TakeOrderedAndProject (sample MEMBERSHIP is the value
    under test)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    return (
        diagnose.weighted_sample(
            d,
            k=60,
            id_col="doc_id",
            weight_col=F.length("text") + F.lit(1),
        )
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


SQL_WEIGHTED_SAMPLE = r"""
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source
  FROM documents
  ORDER BY
    -ln((('0x' || substr(md5('w0:' || doc_id::VARCHAR), 1, 15))::BIGINT + 1)
        / 1152921504606846976.0)
      / (length(text) + 1) ASC,
    doc_id ASC
  LIMIT 60
) ORDER BY doc_id
"""


def q_substring_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-indexed substring search (text.substring_search, the
    pg_trgm LIKE-acceleration shape): posting-list intersection over
    the query's 2 rarest trigrams (prune_grams — fewer grams only
    WIDEN the candidate superset) + exact instr verify on candidates
    only.  The oracle is the plain full-scan contains filter — a hash
    match proves the index path is lossless."""
    return etext.substring_search(
        _spread(spark, _t(spark, sf_dir, "documents")),
        query="vector table",
        prune_grams=2,
    ).orderBy("doc_id")


SQL_SUBSTRING_SEARCH = """
SELECT doc_id, strpos(lower(text), 'vector table')::INTEGER AS first_pos
FROM documents
WHERE contains(lower(text), 'vector table')
ORDER BY doc_id
"""


def q_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source bigram type–token ratio (text.ngram_diversity):
    zero-shuffle zip_with bigram pairing + the two-stage distinct
    aggregate — the corpus-level self-repetition signal."""
    return etext.ngram_diversity(_t(spark, sf_dir, "documents")).orderBy(
        "source"
    )


SQL_NGRAM_DIVERSITY = r"""
WITH tk AS (
  SELECT source,
         regexp_split_to_array(trim(lower(text)), '[ \t\n\x0b\f\r]+') AS t
  FROM documents
),
bg AS (
  SELECT source, array_to_string(t[i:i+1], ' ') AS bigram
  FROM tk, UNNEST(range(1, greatest(len(t) - 1, 0) + 1)) r(i)
  WHERE len(t) >= 2
)
SELECT source, count(*) AS total_bigrams,
       count(DISTINCT bigram) AS distinct_bigrams,
       round(count(DISTINCT bigram)::DOUBLE / count(*), 6) AS diversity
FROM bg GROUP BY source ORDER BY source
"""


def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted per-source sampling (mix.token_budget_sample):
    keep each source's hash-ordered prefix of docs until 800 tokens —
    first crossing doc kept, overshoot ≤ one doc; one window cumsum
    per low-cardinality source key."""
    return mix.token_budget_sample(
        _t(spark, sf_dir, "documents"), budget_tokens=800
    ).orderBy("source", "doc_id")


SQL_TOKEN_BUDGET_SAMPLE = r"""
WITH t AS (
  SELECT source AS grp, doc_id AS id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text),
                                             '[ \t\n\x0b\f\r]+')) END
           AS n_tokens,
         md5('s0:' || doc_id::VARCHAR) AS sk
  FROM documents
),
cum AS (
  SELECT grp, id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY grp ORDER BY sk ASC, id ASC
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM t
)
SELECT grp AS source, id AS doc_id, n_tokens, cum_tokens::BIGINT AS cum_tokens
FROM cum WHERE cum_tokens - n_tokens < 800
ORDER BY source, doc_id
"""


def q_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transitions over per-user event sequences
    (analytics.transition_matrix): one lag window per user, |states|²
    partial-agg matrix, row totals broadcast back — never a fact-table
    window for the probabilities."""
    return analytics.transition_matrix(_t(spark, sf_dir, "events")).orderBy(
        "from_state", "to_state"
    )


SQL_TRANSITION_MATRIX = r"""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC) AS nxt
  FROM events
),
pairs AS (
  SELECT event_type AS from_state, nxt AS to_state
  FROM seq WHERE nxt IS NOT NULL
),
counts AS (
  SELECT from_state, to_state, count(*) AS n
  FROM pairs GROUP BY from_state, to_state
),
totals AS (SELECT from_state, sum(n) AS row_n FROM counts GROUP BY from_state)
SELECT c.from_state, c.to_state, c.n,
       round(c.n::DOUBLE / t.row_n, 6) AS p
FROM counts c JOIN totals t USING (from_state)
ORDER BY c.from_state, c.to_state
"""


def q_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outliers (diagnose.anomaly_flags): exact
    DECIMAL (n, Σx, Σx²) partial aggs broadcast back; the 3σ compare is
    squared — division- and sqrt-free — so there is no rounding
    boundary for engines to disagree on."""
    return diagnose.anomaly_flags(
        _t(spark, sf_dir, "events"),
        key_col="event_type",
        value_col="value",
        id_col="event_id",
        z=3.0,
    ).orderBy("event_type", "event_id")


SQL_ANOMALY_FLAGS = r"""
WITH base AS (
  SELECT event_type AS key, event_id AS id,
         CAST(value AS DECIMAL(18,6)) AS x
  FROM events WHERE value IS NOT NULL
),
stats AS (
  SELECT key, count(*) AS n,
         CAST(sum(x) AS DECIMAL(38,6)) AS sx,
         CAST(sum(CAST(x AS DECIMAL(19,6)) * x) AS DECIMAL(38,6)) AS sxx
  FROM base GROUP BY key HAVING count(*) >= 2
)
SELECT b.key AS event_type, b.id AS event_id,
       round(b.x::DOUBLE, 6) AS value
FROM base b JOIN stats s ON b.key = s.key
WHERE (s.n::DOUBLE * b.x::DOUBLE - s.sx::DOUBLE)
      * (s.n::DOUBLE * b.x::DOUBLE - s.sx::DOUBLE)
      > 9.0 * s.n::DOUBLE
        * (s.n::DOUBLE * s.sxx::DOUBLE - s.sx::DOUBLE * s.sx::DOUBLE)
ORDER BY event_type, event_id
"""


# ------------------------------------------- behavioral / graph analytics
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase over the event log
    (analytics.event_funnel): stage i requires an event strictly after
    the user's earliest stage-(i-1) event — first-touch anchoring.
    Every shuffle hashes on user_id and per-stage state is one row per
    user; the DuckDB twin re-derives each stage as a min-ts join CTE."""
    return analytics.event_funnel(
        _t(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


SQL_EVENT_FUNNEL = r"""
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
  WHERE e.event_type = 'click' GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT 1::INT AS stage, 'view' AS event_type,
       (SELECT count(*) FROM s1) AS users
UNION ALL
SELECT 2::INT, 'click', (SELECT count(*) FROM s2)
UNION ALL
SELECT 3::INT, 'purchase', (SELECT count(*) FROM s3)
"""


def q_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of event_funnel (custom stateful operator —
    applyInPandasWithState greedy earliest-first advancement, two
    scalars of state per user).  Reach events are final at emission
    (nothing censored in state), so the streamed rows aggregated to
    per-stage counts SHARE the batch oracle verbatim; the stage spine
    left-join keeps zero-user stages present like the batch UNION."""
    import shutil

    from engine.spark import streaming

    src = tempfile.mkdtemp(prefix="funnel_src_")
    (
        _t(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .orderBy("ts", "event_id")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(src)
    )
    ckpt = tempfile.mkdtemp(prefix="funnel_ckpt_")
    sink = f"stream_funnel_{uuid.uuid4().hex[:8]}"
    reaches = streaming.stream_funnel(spark, src, ckpt, sink_table=sink)
    shutil.rmtree(ckpt, ignore_errors=True)
    spine = spark.createDataFrame(
        [(1, "view"), (2, "click"), (3, "purchase")],
        "stage: int, event_type: string",
    )
    agg = reaches.groupBy("stage", "event_type").agg(
        F.count("*").alias("_users")
    )
    return spine.join(agg, ["stage", "event_type"], "left").select(
        "stage",
        "event_type",
        F.coalesce(F.col("_users"), F.lit(0)).cast("long").alias("users"),
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix (analytics.cohort_retention):
    cohort = Monday-start week of first event; counts of cohort users
    active per week offset.  Pure integer counts on aligned week
    boundaries, so the twin cannot drift on date arithmetic."""
    return analytics.cohort_retention(_t(spark, sf_dir, "events"))


SQL_COHORT_RETENTION = r"""
WITH first AS (
  SELECT user_id, date_trunc('week', min(ts))::DATE AS cohort_week
  FROM events GROUP BY user_id
), act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS week
  FROM events
)
SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
       (date_diff('day', f.cohort_week, a.week) / 7)::INT AS week_offset,
       count(*) AS users
FROM act a JOIN first f ON a.user_id = f.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration fixed-point PageRank (analytics.pagerank_fixedpoint)
    over the supplier↔customer trade graph (lineitem ⋈ orders, both
    directions so the graph has cycles; customer ids offset by 100000
    into the shared node namespace).  All arithmetic is 64-bit integer
    (scale 10^6, floor division), so ranks are BIT-IDENTICAL across
    engines — no float-sum aggregation-order hazard — and the DuckDB
    twin unrolls the three iterations as CTEs."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_suppkey").cast("long").alias("s"),
        (F.col("o_custkey") + 100000).cast("long").alias("c"),
    )
    edges = j.select(F.col("s").alias("src"), F.col("c").alias("dst")).union(
        j.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    )
    return analytics.pagerank_fixedpoint(edges, iters=3).orderBy("node")


SQL_PAGERANK = r"""
WITH j AS (
  SELECT DISTINCT l_suppkey::BIGINT AS s, (o_custkey + 100000)::BIGINT AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), e AS (
  SELECT s AS src, c AS dst FROM j
  UNION
  SELECT c AS src, s AS dst FROM j
), nodes AS (
  SELECT src AS node FROM e UNION SELECT dst FROM e
), outdeg AS (
  SELECT src, count(*) AS outdeg FROM e GROUP BY src
), r0 AS (
  SELECT node, 1000000::BIGINT AS rank_fp FROM nodes
), i1 AS (
  SELECT e.dst AS node, sum(r0.rank_fp // o.outdeg)::BIGINT AS inflow
  FROM e JOIN r0 ON e.src = r0.node JOIN outdeg o ON e.src = o.src
  GROUP BY e.dst
), r1 AS (
  SELECT n.node,
         (150000 + (85 * coalesce(i.inflow, 0)) // 100)::BIGINT AS rank_fp
  FROM nodes n LEFT JOIN i1 i ON n.node = i.node
), i2 AS (
  SELECT e.dst AS node, sum(r1.rank_fp // o.outdeg)::BIGINT AS inflow
  FROM e JOIN r1 ON e.src = r1.node JOIN outdeg o ON e.src = o.src
  GROUP BY e.dst
), r2 AS (
  SELECT n.node,
         (150000 + (85 * coalesce(i.inflow, 0)) // 100)::BIGINT AS rank_fp
  FROM nodes n LEFT JOIN i2 i ON n.node = i.node
), i3 AS (
  SELECT e.dst AS node, sum(r2.rank_fp // o.outdeg)::BIGINT AS inflow
  FROM e JOIN r2 ON e.src = r2.node JOIN outdeg o ON e.src = o.src
  GROUP BY e.dst
), r3 AS (
  SELECT n.node,
         (150000 + (85 * coalesce(i.inflow, 0)) // 100)::BIGINT AS rank_fp
  FROM nodes n LEFT JOIN i3 i ON n.node = i.node
)
SELECT node, rank_fp FROM r3 ORDER BY node
"""


def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join (joins.interval_overlap_join):
    2h view-windows against 90min click-windows per user, half-open
    ranges on epoch seconds.  Bucketed equi-join + responsibility-cell
    dedup — never an inequality nested loop; the DuckDB twin IS the
    plain inequality join (independent algorithm)."""
    e = _t(spark, sf_dir, "events")
    sec = F.col("ts").cast("timestamp").cast("long")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        sec.alias("start"),
        (sec + 7200).alias("end"),
        F.col("event_id").alias("view_id"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        sec.alias("start"),
        (sec + 5400).alias("end"),
        F.col("event_id").alias("click_id"),
    )
    out = joins.interval_overlap_join(
        views, clicks, key="user_id", bucket=7200
    )
    return out.orderBy("user_id", "view_id_a", "click_id_b")


SQL_INTERVAL_OVERLAP = r"""
WITH v AS (
  SELECT user_id, floor(epoch(ts))::BIGINT AS s,
         floor(epoch(ts))::BIGINT + 7200 AS e, event_id AS view_id
  FROM events WHERE event_type = 'view'
), c AS (
  SELECT user_id, floor(epoch(ts))::BIGINT AS s,
         floor(epoch(ts))::BIGINT + 5400 AS e, event_id AS click_id
  FROM events WHERE event_type = 'click'
)
SELECT v.user_id, v.s AS start_a, v.e AS end_a,
       c.s AS start_b, c.e AS end_b,
       v.view_id AS view_id_a, c.click_id AS click_id_b
FROM v JOIN c ON v.user_id = c.user_id AND v.s < c.e AND c.s < v.e
ORDER BY v.user_id, view_id_a, click_id_b
"""


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 validity intervals from the event log: each user's
    events ordered by (ts, event_id) become rows valid from their ts
    until the next event's ts (NULL for the open current row) — the
    warehouse dimension-history build.  One window per user_id (high-
    cardinality key — the safe window shape), lead() for the closing
    edge; the DuckDB twin is the same lead over the same order, so this
    pins identical frame semantics across engines."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        (F.lead("ts").over(w).isNull()).alias("is_current"),
    ).orderBy("user_id", "valid_from", "event_id")


SQL_SCD2_INTERVALS = r"""
SELECT user_id, event_id, event_type,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       lead(ts) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, valid_from, event_id
"""


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — recency/frequency/monetary quintiles per user
    — COMPOSING three distributed_ntile calls in one DAG (the scale-safe
    ranking op; the bounded persist cache keeps all three range frames
    materialized).  Monetary sums as DECIMAL so quintile order is
    engine-exact; recency ranks on the last-event timestamp directly.  Oracle uses
    plain NTILE windows with the same (value ASC, user_id ASC) tie
    rule."""
    agg = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("recency"),  # NTZ-safe: rank on the ts itself
            F.count("*").alias("frequency"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(20,6)")
            .alias("monetary"),
        )
        .withColumn("seg", F.lit("all"))
    )
    scores = []
    for metric, name in (
        ("recency", "r_score"),
        ("frequency", "f_score"),
        ("monetary", "m_score"),
    ):
        scores.append(
            diagnose.distributed_ntile(
                agg, "seg", metric, "user_id", buckets=5
            ).select("user_id", F.col("bucket").cast("long").alias(name))
        )
    out = scores[0].join(scores[1], "user_id").join(scores[2], "user_id")
    return out.select(
        "user_id",
        "r_score",
        "f_score",
        "m_score",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).alias("rfm"),
    ).orderBy("user_id")


SQL_RFM_SEGMENTS = r"""
WITH a AS (
  SELECT user_id, max(ts) AS recency, count(*) AS frequency,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(20,6))
           AS monetary
  FROM events GROUP BY user_id
), s AS (
  SELECT user_id,
    ntile(5) OVER (ORDER BY recency ASC, user_id ASC)::BIGINT AS r_score,
    ntile(5) OVER (ORDER BY frequency ASC, user_id ASC)::BIGINT AS f_score,
    ntile(5) OVER (ORDER BY monetary ASC, user_id ASC)::BIGINT AS m_score
  FROM a
)
SELECT user_id, r_score, f_score, m_score,
       r_score * 100 + f_score * 10 + m_score AS rfm
FROM s ORDER BY user_id
"""


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram Shannon entropy per document (text.token_entropy) over
    documents < 80 plus two planted degenerates: a single-repeated-token
    doc (entropy exactly 0) and an empty doc (n_tokens 0, entropy 0 via
    the left-join coalesce path).  Per-term contributions round to 6 dp
    then accumulate as DECIMAL(20,6) — aggregation-order-proof."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 80)
        .select("doc_id", "text")
        .unionByName(
            spark.createDataFrame(
                [(9400001, "spam spam spam spam"), (9400002, "")],
                "doc_id: long, text: string",
            )
        )
    )
    return etext.token_entropy(d).orderBy("doc_id")


SQL_TOKEN_ENTROPY = r"""
WITH score AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 80
  UNION ALL SELECT 9400001, 'spam spam spam spam'
  UNION ALL SELECT 9400002, ''
), toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)),
                                      '[ \t\n\x0b\f\r]+')) AS term
  FROM score
), tf AS (
  SELECT doc_id, term, count(*) AS c
  FROM toks WHERE term <> '' GROUP BY doc_id, term
), tot AS (
  SELECT doc_id, sum(c)::BIGINT AS n, count(*)::BIGINT AS distinct_tokens
  FROM tf GROUP BY doc_id
), ent AS (
  SELECT tf.doc_id,
         sum(round(-((tf.c::DOUBLE / t.n) * ln(tf.c::DOUBLE / t.n)),
                   6)::DECIMAL(20,6))::DECIMAL(20,6) AS entropy
  FROM tf JOIN tot t ON tf.doc_id = t.doc_id GROUP BY tf.doc_id
)
SELECT s.doc_id, coalesce(t.n, 0) AS n_tokens,
       coalesce(t.distinct_tokens, 0) AS distinct_tokens,
       coalesce(e.entropy, 0::DECIMAL(20,6)) AS entropy
FROM score s
LEFT JOIN tot t ON s.doc_id = t.doc_id
LEFT JOIN ent e ON s.doc_id = e.doc_id
ORDER BY s.doc_id
"""


def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (joins.asof_join direction='forward'): each
    trade gets the EARLIEST same-user quote at-or-after its timestamp —
    the symmetric next-quote lookup, sharing the backward query's
    fixtures and de-tie rule.  The DuckDB oracle uses the native ASOF
    JOIN with the inequality flipped (t.ts <= q.ts) — an independent
    algorithm."""
    e = _t(spark, sf_dir, "events")
    wq = Window.partitionBy("user_id", "ts").orderBy("event_id")
    quotes = (
        e.filter(F.col("event_id") % 17 == 0)
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            "ts",
            F.col("event_id").alias("quote_id"),
            F.col("value").alias("quote_value"),
        )
    )
    trades = e.filter(F.col("event_id") % 17 != 0).select(
        "event_id", "user_id", "ts", "value"
    )
    out = joins.asof_join(
        trades, quotes, key="user_id", ts_col="ts", direction="forward"
    )
    return out.select(
        "event_id", "user_id", "ts", "value",
        "asof_ts", "asof_quote_id", "asof_quote_value",
    )


SQL_ASOF_JOIN_FORWARD = """
WITH quotes AS (
  SELECT user_id, ts, event_id AS quote_id, value AS quote_value
  FROM events WHERE event_id % 17 = 0
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) = 1
),
trades AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_id % 17 != 0
)
SELECT t.event_id, t.user_id, t.ts, t.value,
       q.ts AS asof_ts, q.quote_id AS asof_quote_id,
       q.quote_value AS asof_quote_value
FROM trades t
ASOF LEFT JOIN quotes q ON t.user_id = q.user_id AND t.ts <= q.ts
"""


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width 12-bin histogram of events.value
    (diagnose.value_histogram): (min,max) as one broadcast single-row
    aggregate, binning as a codegen projection, one partial-agg shuffle
    on the bin id.  bin = floor((v−min)/width) is identical IEEE double
    arithmetic in both engines."""
    return diagnose.value_histogram(
        _t(spark, sf_dir, "events"), "value", n_bins=12
    )


SQL_VALUE_HISTOGRAM = r"""
WITH s AS (
  SELECT min(value)::DOUBLE AS slo, max(value)::DOUBLE AS shi FROM events
), b AS (
  SELECT (CASE WHEN s.shi = s.slo THEN 0
          ELSE least(floor((e.value - s.slo) / ((s.shi - s.slo) / 12.0)),
                     11) END)::INT AS bin,
         s.slo AS slo, (s.shi - s.slo) / 12.0 AS w
  FROM events e CROSS JOIN s WHERE e.value IS NOT NULL
)
SELECT bin, round(slo + bin * w, 6) AS lo,
       round(slo + (bin + 1) * w, 6) AS hi, count(*) AS n
FROM b GROUP BY bin, slo, w ORDER BY bin
"""


def q_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — top-20 customers by revenue lost to returned
    items in one quarter: date + returnflag filters PUSHED to the
    scans, revenue kept as an exact DECIMAL sum end-to-end (rounding
    through double hits half-cent ties), nation broadcast, deterministic
    top-20 via (revenue DESC, c_custkey ASC) TakeOrdered — never a
    global sort."""
    dec = lambda c: c.cast("decimal(18,4)")
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(
            "l_orderkey",
            dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "_rev"
            ),
        )
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1996-04-01"))
        )
        .select("o_orderkey", "o_custkey")
    )
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        # exact DECIMAL output — rounding through double would hit the
        # half-cent tie (sums of 4-dp prices often end in .xx50, where
        # Spark's BigDecimal half-up and DuckDB's scaled-multiply round
        # disagree by one cent)
        .agg(F.sum("_rev").cast("decimal(20,6)").alias("revenue"))
    )
    return (
        rev.join(c, rev.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


SQL_Q10_RETURNED_ITEMS = r"""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(18,4))) AS DECIMAL(20,6)) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1996-04-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC LIMIT 20
"""


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact φ-heavy hitters over events.user_id (φ=0.0075) by
    bounded-memory Misra–Gries candidate generation (mapInPandas, O(1/φ)
    counters per task — never a full-cardinality shuffle) + broadcast
    exact verification (diagnose.heavy_hitters).  Output is exact, so
    the DuckDB twin is a plain GROUP BY / HAVING."""
    return diagnose.heavy_hitters(
        _t(spark, sf_dir, "events"), "user_id", phi=0.0075
    )


SQL_HEAVY_HITTERS = r"""
WITH tot AS (SELECT count(*) AS n_total FROM events),
c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
SELECT c.user_id, c.n, round(c.n::DOUBLE / t.n_total, 6) AS share
FROM c CROSS JOIN tot t
WHERE c.n > 0.0075 * t.n_total
ORDER BY c.n DESC, c.user_id
"""


def q_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the user co-occurrence graph
    (edge = two users active in the same (event_type, hour) group;
    hot groups > 64 members dropped BEFORE the pair self-join — the
    df-cap discipline).  Spark enumerates by degree-ordered wedge join
    (analytics.triangle_counts, O(m^1.5) bound); the DuckDB twin uses
    plain id-ordered a<b<c enumeration — an independent algorithm that
    must produce identical per-node counts."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "user_id",
    )
    edges = analytics.cooccurrence_edges(
        ev, ["event_type", "hour"], "user_id", max_group=64
    )
    return analytics.triangle_counts(edges).orderBy("node")


SQL_TRIANGLE_COUNTS = r"""
WITH g AS (
  SELECT DISTINCT event_type, date_trunc('hour', ts) AS h, user_id
  FROM events
), sz AS (
  SELECT event_type, h FROM g
  GROUP BY event_type, h HAVING count(*) <= 64
), c AS (
  SELECT g.* FROM g JOIN sz USING (event_type, h)
), e AS (
  SELECT DISTINCT a.user_id::BIGINT AS u, b.user_id::BIGINT AS v
  FROM c a JOIN c b
    ON a.event_type = b.event_type AND a.h = b.h
   AND a.user_id < b.user_id
), t AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c2
  FROM e e1
  JOIN e e2 ON e1.v = e2.u
  JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v
), n AS (
  SELECT a AS node FROM t
  UNION ALL SELECT b FROM t
  UNION ALL SELECT c2 FROM t
)
SELECT node, count(*) AS triangles FROM n GROUP BY node ORDER BY node
"""


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 retrieval for the query {join, vector, window}
    over documents (text.bm25_topk) — the inverted-index scoring shape
    with the exploded token stream filtered to query terms BEFORE any
    shuffle.  Per-term scores round to 6 dp then accumulate as
    DECIMAL(20,6) so the per-doc sum is aggregation-order-proof."""
    return etext.bm25_topk(
        _t(spark, sf_dir, "documents"), ["join", "vector", "window"], k=10
    )


SQL_BM25 = r"""
WITH stats AS (
  SELECT count(*) AS n_docs,
         avg(CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE len(regexp_split_to_array(trim(text),
                                            '[ \t\n\x0b\f\r]+')) END)
           AS avgdl
  FROM documents
), toks AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
           ELSE len(regexp_split_to_array(trim(text),
                                          '[ \t\n\x0b\f\r]+')) END AS dl,
         unnest(regexp_split_to_array(trim(lower(text)),
                                      '[ \t\n\x0b\f\r]+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
  FROM toks WHERE term IN ('join', 'vector', 'window')
  GROUP BY doc_id, term
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id,
         round(ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * (1.2 + 1.0))
               / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl)),
               6)::DECIMAL(20,6) AS s_
  FROM tf JOIN df USING (term) CROSS JOIN stats s
), agg AS (
  SELECT doc_id, sum(s_)::DECIMAL(20,6) AS score
  FROM scored GROUP BY doc_id
  ORDER BY score DESC, doc_id LIMIT 10
)
SELECT doc_id, score,
       row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank
FROM agg
"""


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (similarity.rrf_fuse):
    a lexical BM25 top-50 leg over documents for the query {join, vector,
    window} fused with a vector top-50 leg (exact cosine neighbors of
    embedding 0, vec_id == doc_id in the driver tables) — rrf(d) =
    Σ 1/(60 + rank_leg(d)), fused top-10.  Both legs keep their own scale
    shapes (postings filtered before any shuffle / broadcast query set);
    the fusion itself touches only the two K-row candidate lists."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = etext.bm25_topk(
        docs, ["join", "vector", "window"], k=50
    ).select("doc_id", "rank")
    vec = similarity.brute_force_topk(emb, n_queries=1, k=50).select(
        F.col("neighbor_id").alias("doc_id"), "rank"
    )
    return similarity.rrf_fuse(lex, vec, k0=60, k=10)


SQL_RRF_FUSION = r"""
WITH stats AS (
  SELECT count(*) AS n_docs,
         avg(CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE len(regexp_split_to_array(trim(text),
                                            '[ \t\n\x0b\f\r]+')) END)
           AS avgdl
  FROM documents
), toks AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
           ELSE len(regexp_split_to_array(trim(text),
                                          '[ \t\n\x0b\f\r]+')) END AS dl,
         unnest(regexp_split_to_array(trim(lower(text)),
                                      '[ \t\n\x0b\f\r]+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
  FROM toks WHERE term IN ('join', 'vector', 'window')
  GROUP BY doc_id, term
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id,
         round(ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
               * (tf.tf * (1.2 + 1.0))
               / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl)),
               6)::DECIMAL(20,6) AS s_
  FROM tf JOIN df USING (term) CROSS JOIN stats s
), lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS rank_a
  FROM (SELECT doc_id, sum(s_)::DECIMAL(20,6) AS score
        FROM scored GROUP BY doc_id
        ORDER BY score DESC, doc_id LIMIT 50)
), base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), qv AS (
  SELECT v AS q FROM base WHERE vec_id = 0
), vs AS (
  SELECT b.vec_id AS doc_id,
         round(list_inner_product(qv.q, b.v) /
               (sqrt(list_inner_product(qv.q, qv.q)) *
                sqrt(list_inner_product(b.v, b.v))), 6) AS cs
  FROM base b CROSS JOIN qv WHERE b.vec_id != 0
), vec AS (
  SELECT doc_id, rank_b FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY cs DESC, doc_id)::BIGINT AS rank_b
    FROM vs
  ) WHERE rank_b <= 50
), fused AS (
  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id, rank_a, rank_b,
         round(COALESCE(1.0::DOUBLE / (60 + rank_a), 0)
               + COALESCE(1.0::DOUBLE / (60 + rank_b), 0), 6) AS rrf_score
  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
), top AS (
  SELECT * FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10
)
SELECT doc_id, rank_a, rank_b, rrf_score,
       row_number() OVER (ORDER BY rrf_score DESC, doc_id)::BIGINT AS rank
FROM top
"""


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(label, dim) mean drift between two embedding snapshots
    (similarity.embedding_drift) — snapshots = even/odd vec_id halves of
    the driver table.  Values snap to the fixed micro grid
    floor(v·10⁶+0.5) so group sums are exact integers; one partial-agg
    exchange per snapshot, tiny broadcast join after."""
    e = _t(spark, sf_dir, "embeddings")
    return similarity.embedding_drift(
        e.filter(F.col("vec_id") % 2 == 0),
        e.filter(F.col("vec_id") % 2 == 1),
    )


SQL_EMBEDDING_DRIFT = r"""
WITH e AS (
  SELECT vec_id, label, unnest(embedding::DOUBLE[]) AS v,
         generate_subscripts(embedding, 1) - 1 AS dim
  FROM embeddings
), c AS (
  SELECT vec_id, label, dim, floor(v * 1000000.0 + 0.5)::BIGINT AS c
  FROM e
), a AS (
  SELECT label, dim, sum(c) AS sum_a, count(*) AS n_a
  FROM c WHERE vec_id % 2 = 0 GROUP BY 1, 2
), b AS (
  SELECT label, dim, sum(c) AS sum_b, count(*) AS n_b
  FROM c WHERE vec_id % 2 = 1 GROUP BY 1, 2
)
SELECT a.label, a.dim::BIGINT AS dim, n_a, n_b,
       round(sum_a / n_a / 1000000.0, 6) AS mean_a,
       round(sum_b / n_b / 1000000.0, 6) AS mean_b,
       round(sum_b / n_b / 1000000.0 - sum_a / n_a / 1000000.0, 6)
         AS drift
FROM a JOIN b USING (label, dim)
"""


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source exact-duplication matrix (dedup.source_overlap) —
    distinct shared fingerprints per source pair, never a doc×doc self
    join.  The planted 'mirror' source (docs 0-149 relabeled) guarantees
    every original source shares fingerprints with it, firing the pair
    expansion and the jaccard arithmetic under the oracle."""
    d = _t(spark, sf_dir, "documents")
    planted = d.filter(F.col("doc_id") < 150).withColumn(
        "source", F.lit("mirror")
    )
    return dedup.source_overlap(d.unionByName(planted))


SQL_SOURCE_OVERLAP = r"""
WITH d AS (
  SELECT text, source FROM documents
  UNION ALL
  SELECT text, 'mirror' AS source FROM documents WHERE doc_id < 150
), f AS (
  SELECT DISTINCT
         md5(lower(regexp_replace(text, '[ \t\n\x0b\f\r]+', ' ', 'g'))) AS fp,
         source AS src
  FROM d
), n AS (
  SELECT src, count(*) AS n_fp FROM f GROUP BY src
), s AS (
  SELECT a.src AS source_a, b.src AS source_b, count(*) AS n_shared
  FROM f a JOIN f b ON a.fp = b.fp AND a.src < b.src
  GROUP BY 1, 2
)
SELECT s.source_a, s.source_b, s.n_shared,
       na.n_fp AS n_a, nb.n_fp AS n_b,
       round(s.n_shared::DOUBLE / (na.n_fp + nb.n_fp - s.n_shared), 6)
         AS jaccard
FROM s
JOIN n na ON na.src = s.source_a
JOIN n nb ON nb.src = s.source_b
"""


def q_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — customer order-count distribution: LEFT OUTER
    join customer←orders (urgent orders excluded, the "special
    requests" analog) so zero-order customers survive with count 0,
    then a second aggregation over the counts.  Two shuffles total
    (custkey join+agg share one exchange under AQE, then the tiny
    c_count agg); pure integer counts so the twin cannot drift."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


SQL_Q13_CUSTDIST = r"""
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — promo revenue share for one month: date filter
    pushed to the lineitem scan, conditional aggregation (CASE inside
    SUM) over the part join so both numerator and denominator come from
    ONE scan + ONE join + ONE partial agg.  Revenue sums stay exact
    DECIMAL; only the final share is a rounded double.  part is joined
    on partkey (at 100 TB part is a fact-sized table — no broadcast
    assumption; AQE picks the strategy at small SF)."""
    dec = lambda c: c.cast("decimal(18,4)")
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01"))
            & (F.col("l_shipdate") < F.lit("1997-04-01"))
        )
        .select(
            "l_partkey",
            dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "_rev"
            ),
        )
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    agg = (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", F.col("_rev")).otherwise(
                    F.lit(0).cast("decimal(18,4)")
                )
            )
            .cast("decimal(20,6)")
            .alias("promo_revenue"),
            F.sum("_rev").cast("decimal(20,6)").alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        F.round(
            F.lit(100.0)
            * F.col("promo_revenue").cast("double")
            / F.col("total_revenue").cast("double"),
            6,
        ).alias("promo_pct"),
    )


SQL_Q14_PROMO_EFFECT = r"""
WITH agg AS (
  SELECT
    CAST(sum(CASE WHEN p.p_type = 'PROMO'
             THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(20,6))
      AS promo_revenue,
    CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
         AS DECIMAL(20,6)) AS total_revenue
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate >= '1997-03-01' AND l.l_shipdate < '1997-04-01'
)
SELECT promo_revenue, total_revenue,
       round(100.0 * promo_revenue::DOUBLE / total_revenue::DOUBLE, 6)
         AS promo_pct
FROM agg
"""


def q_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — revenue from small-quantity orders of one
    brand: the correlated scalar subquery (qty < 0.2 * per-part avg)
    decorrelated into a per-part partial agg joined back to the fact.
    The avg compare is division-free — ``5*qty*cnt < sum_qty`` in
    DECIMAL — so both engines decide each row identically (DECIMAL
    division scale rules differ between Spark and DuckDB; multiplication
    does not).  The aggregated side is per-part (small after the partial
    agg) but NOT broadcast-forced: at 10^9 parts it exceeds broadcast
    range and a shuffle join on partkey is the honest shape."""
    dq = lambda c: c.cast("decimal(18,4)")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        dq(F.col("l_quantity")).alias("_qty"),
        dq(F.col("l_extendedprice")).alias("_price"),
    )
    branded = li.join(p, li.l_partkey == p.p_partkey).select(
        "l_partkey", "_qty", "_price"
    )
    per_part = branded.groupBy("l_partkey").agg(
        F.sum("_qty").cast("decimal(20,4)").alias("_sum_qty"),
        F.count("*").alias("_cnt"),
    )
    small = branded.join(per_part, "l_partkey").filter(
        F.lit(5).cast("decimal(10,0)")
        * F.col("_qty")
        * F.col("_cnt").cast("decimal(10,0)")
        < F.col("_sum_qty")
    )
    return small.agg(
        F.round(
            F.sum("_price").cast("decimal(20,6)").cast("double") / F.lit(7.0),
            6,
        ).alias("avg_yearly")
    )


SQL_Q17_SMALL_QTY = r"""
WITH branded AS (
  SELECT l.l_partkey,
         CAST(l.l_quantity AS DECIMAL(18,4)) AS _qty,
         CAST(l.l_extendedprice AS DECIMAL(18,4)) AS _price
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = 'Brand#13'
),
per_part AS (
  SELECT l_partkey, CAST(sum(_qty) AS DECIMAL(20,4)) AS _sum_qty,
         count(*) AS _cnt
  FROM branded GROUP BY l_partkey
)
SELECT round(CAST(sum(b._price) AS DECIMAL(20,6))::DOUBLE / 7.0, 6)
         AS avg_yearly
FROM branded b JOIN per_part pp ON b.l_partkey = pp.l_partkey
WHERE CAST(5 AS DECIMAL(10,0)) * b._qty * CAST(pp._cnt AS DECIMAL(10,0))
      < pp._sum_qty
"""


def q_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — large-volume orders: GROUP BY l_orderkey
    HAVING sum(qty) > threshold, then the qualifying key set joins back
    to orders+customer for the report.  The HAVING side is a partial
    agg (map-side combine) so the join input is only qualifying keys;
    top-100 via deterministic (o_totalprice DESC, o_orderkey)
    TakeOrdered, never a global sort.  Quantity sums in DECIMAL."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("decimal(18,4)").alias("_qty")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("_qty").cast("decimal(20,6)").alias("sum_qty"))
        .filter(F.col("sum_qty") > F.lit(150))
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


SQL_Q18_LARGE_ORDERS = r"""
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(20,6))
           AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum_qty > 150
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       o.o_totalprice, b.sum_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey ASC LIMIT 100
"""


def q_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — wealthy customers with no orders, by nation:
    the scalar subquery (global avg positive acctbal) rides as a
    broadcast single-row agg; the avg compare is division-free —
    ``acctbal * cnt > sum`` in DECIMAL — so each row's verdict is
    engine-exact; "idle" is a LEFT ANTI join against the keys of
    RECENT orders (this synthetic corpus gives nearly every customer
    *some* order, so the all-time anti-join returned zero rows at
    every SF — an empty contract query proves nothing; the recent-
    orders variant keeps the Q22 shape and makes the anti-join bite).
    Output integer counts + DECIMAL balances only."""
    dec = lambda c: c.cast("decimal(18,4)")
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", dec(F.col("c_acctbal")).alias("_bal")
    )
    thresh = (
        c.filter(F.col("_bal") > 0)
        .agg(
            F.sum("_bal").cast("decimal(20,4)").alias("_sum_bal"),
            F.count("*").alias("_cnt"),
        )
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
    )
    rich = c.crossJoin(F.broadcast(thresh)).filter(
        F.col("_bal") * F.col("_cnt").cast("decimal(10,0)")
        > F.col("_sum_bal")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        idle.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum("_bal")
            .cast("decimal(20,4)")
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


SQL_Q22_IDLE_CUSTOMERS = r"""
WITH c AS (
  SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(18,4)) AS _bal
  FROM customer
),
thresh AS (
  SELECT CAST(sum(_bal) AS DECIMAL(20,4)) AS _sum_bal, count(*) AS _cnt
  FROM c WHERE _bal > 0
)
SELECT c.c_nationkey, count(*) AS numcust,
       CAST(CAST(sum(c._bal) AS DECIMAL(20,4)) AS DOUBLE) AS totacctbal
FROM c CROSS JOIN thresh t
WHERE c._bal * CAST(t._cnt AS DECIMAL(10,0)) > t._sum_bal
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= '2000-01-01')
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
"""


def q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — forecast revenue change: a pure scan-filter-agg
    with ZERO joins and ZERO shuffles beyond the final single-row
    combine.  All three predicates (date range, discount band, quantity
    cap) sit in PushedFilters at the parquet scan, and only four columns
    survive pruning — at 100 TB this query's cost is I/O on the pruned
    row groups, nothing else.  Revenue stays exact DECIMAL end to end."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(
            (F.col("l_extendedprice") * F.col("l_discount")).cast(
                "decimal(18,4)"
            )
        )
        .cast("decimal(20,4)")
        .cast("double")
        .alias("revenue")
    )


SQL_Q6_FORECAST_REVENUE = r"""
SELECT CAST(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
       AS DECIMAL(20,4)) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


def q_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: no l_commitdate/l_receiptdate in this
    corpus — the EXISTS predicate is 'order has a returned lineitem',
    same semi-join skeleton): priority distribution of one quarter's
    orders that have at least one matching lineitem.  The EXISTS
    decorrelates to a LEFT SEMI join on orderkey — Spark never
    materializes the match multiplicity, so a 7-lineitem order costs
    the same as a 1-lineitem order, and the quarter filter on orders
    prunes the probe side before the join.  Pure integer output."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-07-01"))
            & (F.col("o_orderdate") < F.lit("1996-10-01"))
        )
        .select("o_orderkey", "o_orderpriority")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


SQL_Q4_ORDER_PRIORITY = r"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — bilateral shipping volume between two nations
    by year: lineitem⋈orders⋈customer⋈supplier plus two nation dims,
    with the disjunctive nation-pair predicate ((s=N1 ∧ c=N2) ∨
    (s=N2 ∧ c=N1)) applied AFTER both dimension joins.  The nation dims
    are broadcast (25 rows — always broadcastable, even at 100 TB);
    the three fact joins shuffle on their natural keys and AQE handles
    the post-filter size collapse.  Revenue exact DECIMAL; the year
    comes from l_shipdate so the grouping is derivable from pruned
    columns only."""
    dec = lambda c: c.cast("decimal(18,4)")
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            F.year("l_shipdate").alias("l_year"),
            dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "_vol"
            ),
        )
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("_cnk"), F.col("n_name").alias("cust_nation")
        )
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("_snk"))
        .join(n2, F.col("c_nationkey") == F.col("_cnk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.sum("_vol").cast("decimal(20,4)").cast("double").alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


SQL_Q7_VOLUME_SHIPPING = r"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
       CAST(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(18,4))) AS DECIMAL(20,4)) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — one nation's market share of a product type in
    a region, by order year: the deepest dim chain in the suite
    (lineitem⋈part⋈orders⋈customer⋈nation⋈region + a second nation on
    the supplier side).  part is fact-sized at 100 TB so that join
    shuffles on partkey; every geo dim broadcasts.  The share is a
    conditional-sum / total-sum ratio computed from two exact DECIMAL
    sums in the SAME partial agg (one pass), divided only at the end
    as a rounded double — both operands also surface as columns so the
    oracle pins the exact values, not just the quotient."""
    dec = lambda c: c.cast("decimal(18,4)")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_vol"),
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
        )
        .select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n_cust = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("_cnk"),
            F.col("n_regionkey").alias("_crk"),
        )
    )
    r = F.broadcast(
        _t(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n_supp = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("_snk"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n_cust, F.col("c_nationkey") == F.col("_cnk"))
        .join(r, F.col("_crk") == F.col("r_regionkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n_supp, F.col("s_nationkey") == F.col("_snk"))
    )
    agg = joined.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_3", F.col("_vol")).otherwise(
                F.lit(0).cast("decimal(18,4)")
            )
        )
        .cast("decimal(20,4)")
        .cast("double")
        .alias("nation_volume"),
        F.sum("_vol").cast("decimal(20,4)").cast("double").alias(
            "total_volume"
        ),
    )
    return agg.select(
        "o_year",
        "nation_volume",
        "total_volume",
        F.round(F.col("nation_volume") / F.col("total_volume"), 6).alias(
            "mkt_share"
        ),
    ).orderBy("o_year")


SQL_Q8_MARKET_SHARE = r"""
WITH agg AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
         CAST(CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
              THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                   AS DECIMAL(18,4))
              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(20,4)) AS DOUBLE)
           AS nation_volume,
         CAST(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
              AS DECIMAL(18,4))) AS DECIMAL(20,4)) AS DOUBLE)
           AS total_volume
  FROM lineitem l
  JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN region r   ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  WHERE o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1998-01-01'
  GROUP BY 1
)
SELECT o_year, nation_volume, total_volume,
       round(nation_volume / total_volume, 6) AS mkt_share
FROM agg ORDER BY o_year
"""


def q_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: this corpus has no partsupp, so profit
    is gross revenue rather than revenue − supplycost·qty — the join
    topology and group-by are Q9's): revenue from one product type by
    supplier nation and order year.  lineitem⋈part and lineitem⋈orders
    shuffle on their keys; supplier⋈nation broadcasts.  The p_type
    filter lands on the part scan BEFORE the fact join, so the join's
    build side is pre-shrunk — the difference between shuffling 100 TB
    and shuffling one product line."""
    dec = lambda c: c.cast("decimal(18,4)")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("_nk"), F.col("n_name").alias("nation")
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, F.col("s_nationkey") == F.col("_nk"))
        .groupBy("nation", "o_year")
        .agg(
            F.sum("_rev")
            .cast("decimal(20,4)")
            .cast("double")
            .alias("sum_profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


SQL_Q9_PRODUCT_PROFIT = r"""
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
       CAST(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
            AS DECIMAL(18,4))) AS DECIMAL(20,4)) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
GROUP BY 1, 2
ORDER BY 1, 2 DESC
"""


def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — the supplier(s) with maximum quarterly
    revenue: per-supplier partial agg, then the global max rides back
    as a broadcast single-row aggregate and the winner is selected by
    exact DECIMAL equality (the reference query's correlated
    max-subquery, decorrelated).  No window over all suppliers, no
    global sort — the only full-data exchange is the per-supplier
    agg's own shuffle.  Ties (multiple max-revenue suppliers) are all
    returned, matching the SQL semantics."""
    dec = lambda c: c.cast("decimal(18,4)")
    rev = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            )
            .cast("decimal(20,4)")
            .alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_max_rev"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


SQL_Q15_TOP_SUPPLIER = r"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount)
              AS DECIMAL(18,4))) AS DECIMAL(20,4)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE)
         AS total_revenue
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s.s_suppkey
"""


def q_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (adapted to this corpus's columns: brand/size/
    quantity bands instead of container/shipmode) — revenue under an
    OR of three conjunctive brand+size+quantity bands.  The point of
    Q19 is optimizer behavior on disjunctions: Catalyst extracts the
    common sub-predicates (p_size >= 1, l_quantity bounds 1..30) and
    pushes them into BOTH scans while the residual OR evaluates post-
    join inside codegen — so each side's parquet scan already skips
    row groups no disjunct can match.  Revenue exact DECIMAL."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,4)")
        .alias("_rev"),
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(p, li.l_partkey == p.p_partkey).filter(
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.agg(
        F.sum("_rev").cast("decimal(20,4)").cast("double").alias("revenue")
    )


SQL_Q19_DISJUNCTIVE = r"""
SELECT CAST(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
       AS DECIMAL(18,4))) AS DECIMAL(20,4)) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


def q_q21_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: the corpus has no commit/receipt
    dates, so 'kept the order waiting' becomes 'was the sole supplier
    with a returned lineitem in a multi-supplier order' — the same
    EXISTS(other supplier) + NOT EXISTS(other offending supplier)
    skeleton).  Q21's textbook form is two correlated subqueries per
    lineitem; the scale-safe decorrelation here computes ONE per-order
    aggregate (distinct supplier count, distinct offending-supplier
    count) and joins it back — turning two semi/anti join passes over
    the largest fact into one partial agg + one equi-join.  Counts are
    distinct orders per supplier, pure integers."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("_n_offend"),
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    blamed = (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(per_order, "l_orderkey")
        .filter((F.col("_n_supp") >= 2) & (F.col("_n_offend") == 1))
    )
    return (
        blamed.join(s, blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


SQL_Q21_BLAME_SUPPLIER = r"""
WITH per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS _n_supp,
         count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
           AS _n_offend
  FROM lineitem GROUP BY l_orderkey
)
SELECT s.s_name, count(DISTINCT l.l_orderkey) AS numwait
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
JOIN per_order p ON l.l_orderkey = p.l_orderkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
WHERE l.l_returnflag = 'R' AND p._n_supp >= 2 AND p._n_offend = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
"""


def q_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: no partsupp table in this corpus, so
    the supply cost is the minimum observed unit price in lineitem) —
    for each STANDARD part of size ≤ 15, the EUROPE supplier(s)
    offering the minimum unit price.  Q2's signature is the correlated
    min-subquery; here it is decorrelated: per-(part, supplier) min
    unit price in one partial agg, then the per-part global min as a
    window over that ALREADY-REDUCED table — partitioned by the
    high-cardinality part key (bounded suppliers per part, no skew),
    so the fact is scanned exactly once and never re-derived for the
    subquery side.  Both dimensions (scoped parts, scoped suppliers)
    broadcast into the fact scan, so the only full-data exchange is
    the agg's shuffle — at 10^12 lineitem rows nothing else moves.
    Unit price is IEEE double division computed identically by both
    engines, so the min/equality/round pipeline is cross-engine
    exact."""
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15))
        .select("p_partkey", "p_name")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(
                    F.col("r_name") == "EUROPE"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("_unit"),
    )
    cost = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            "l_partkey", "l_suppkey", "p_name", "s_name", "s_acctbal",
            "n_name",
        )
        .agg(F.min("_unit").alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        cost.withColumn("_min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("_min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            F.round(F.col("unit_cost"), 4).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


SQL_Q2_MIN_COST_SUPPLIER = r"""
WITH scope_part AS (
  SELECT p_partkey, p_name FROM part
  WHERE p_type = 'STANDARD' AND p_size <= 15
),
scope_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
cost AS (
  SELECT l_partkey, l_suppkey, p_name, s_name, s_acctbal, n_name,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  JOIN scope_part ON l_partkey = p_partkey
  JOIN scope_supp ON l_suppkey = s_suppkey
  GROUP BY l_partkey, l_suppkey, p_name, s_name, s_acctbal, n_name
),
best AS (
  SELECT l_partkey AS _bk, min(unit_cost) AS _min_cost
  FROM cost GROUP BY l_partkey
)
SELECT c.s_acctbal, c.s_name, c.n_name, c.l_partkey AS p_partkey,
       c.p_name, round(c.unit_cost, 4) AS unit_cost
FROM cost c
JOIN best b ON c.l_partkey = b._bk AND c.unit_cost = b._min_cost
ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, p_partkey
"""


def q_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: shipped value sum(extendedprice ×
    quantity) stands in for ps_supplycost × ps_availqty) — parts whose
    shipped value from NATION_7's suppliers exceeds 0.1% of that
    nation's total.  The signature is the scalar HAVING subquery: one
    per-part partial-agg shuffle over the (nation-restricted) fact,
    then the grand total rides back as a broadcast single-row
    aggregate — no second pass over the fact, no window.  All
    arithmetic DECIMAL-exact on both engines (the 0.001 literal is a
    decimal, never a float)."""
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_7"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") * F.col("l_quantity"))
        .cast("decimal(18,4)")
        .alias("_val"),
    )
    v = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum("_val").alias("part_value"))
    )
    thr = v.agg(
        (
            F.sum("part_value").cast("decimal(38,4)")
            * F.expr("CAST(0.001 AS DECIMAL(4,3))")
        ).alias("_thr")
    )
    return (
        v.crossJoin(F.broadcast(thr))
        .filter(F.col("part_value") > F.col("_thr"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("part_value").cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


SQL_Q11_IMPORTANT_PARTS = r"""
WITH v AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4)))
           AS part_value
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, CAST(part_value AS DOUBLE) AS part_value
FROM v
WHERE part_value > (SELECT CAST(sum(part_value) AS DECIMAL(38,4))
                           * CAST(0.001 AS DECIMAL(4,3)) FROM v)
ORDER BY part_value DESC, p_partkey
"""


def q_q12_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: l_returnflag stands in for
    l_shipmode, ship-lag > 90 days after the order date stands in for
    the receipt/commit-date lateness predicate this corpus lacks) —
    late 1996 shipments split into high-/low-priority line counts per
    flag.  The shape under test is conditional aggregation over a
    fact-fact equi-join: the ship-date range prunes the lineitem scan
    BEFORE the join (pushed to parquet), the lateness predicate
    evaluates post-join inside codegen, and the CASE pair folds in one
    partial agg — one joint shuffle on orderkey, one tiny agg
    exchange."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .select("l_orderkey", "l_returnflag", "l_shipdate")
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


SQL_Q12_PRIORITY_LATENESS = r"""
SELECT l_returnflag,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: distinct (part, supplier) pairs
    observed in lineitem stand in for partsupp; suppliers with
    negative balance stand in for the complaint-comment NOT IN) —
    how many distinct suppliers ship each surviving (brand, type,
    size) descriptor.  The NOT IN decorrelates to a broadcast
    left-anti join on the fact scan; the part dimension broadcasts;
    COUNT(DISTINCT) runs as Spark's two-phase expand/partial-agg — no
    pre-distinct materialization, one logical shuffle."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pf = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        li.join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(pf), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


SQL_Q16_SUPPLIER_VARIETY = r"""
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1,5,9,13,17,21,25,29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_q20_excess_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: 'blue%' part-name prefix stands in
    for 'forest%'; the availqty > half-of-shipped correlated
    comparison becomes window-share-of-total on the same shipped
    quantities, keeping the agg-vs-agg-per-key signature) — suppliers
    whose 1995–96 shipped quantity of blue parts exceeds 30% of their
    all-time total.  Both aggregates fold in ONE pass over the
    prefix-filtered fact (conditional partial agg), the threshold
    compare is integer-scaled DECIMAL (exact on both engines), and the
    winners semi-join back to the supplier dimension."""
    pf = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("blue"))
        .select("p_partkey")
    )
    qty = F.col("l_quantity").cast("decimal(18,4)")
    in_window = (F.col("l_shipdate") >= F.lit("1995-01-01")) & (
        F.col("l_shipdate") < F.lit("1997-01-01")
    )
    q = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(pf), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.when(in_window, qty).otherwise(F.lit(0))).alias(
                "_qty_window"
            ),
            F.sum(qty).alias("_qty_total"),
        )
        .filter(
            F.col("_qty_window") * F.lit(10)
            > F.col("_qty_total") * F.lit(3)
        )
        .select("l_suppkey")
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(q, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


SQL_Q20_EXCESS_SHARE = r"""
WITH q AS (
  SELECT l_suppkey,
    sum(CASE WHEN l_shipdate >= '1995-01-01'
              AND l_shipdate < '1997-01-01'
             THEN CAST(l_quantity AS DECIMAL(18,4)) ELSE 0 END)
      AS qty_window,
    sum(CAST(l_quantity AS DECIMAL(18,4))) AS qty_total
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'blue%'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM q
                    WHERE qty_window * 10 > qty_total * 3)
ORDER BY s_suppkey
"""


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/CCNet-style cross-document line dedup (engine.spark.dedup.
    line_dedup): lines occurring in ≥3 distinct documents are removed
    everywhere, documents reassembled in original line order.  The
    corpus documents are single-line so they pass through untouched
    (unless the whole doc is an exact dup 3+ times over); the planted
    rows 9000001-4 carry a shared SUBSCRIBE/COOKIE boilerplate pair
    across three docs plus one doc that is pure boilerplate and must
    survive as an empty string with n_kept = 0."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = spark.createDataFrame(
        [
            (
                9000001,
                "SUBSCRIBE TO OUR NEWSLETTER\ngenuine content one\nCOOKIE NOTICE",
            ),
            (
                9000002,
                "SUBSCRIBE TO OUR NEWSLETTER\ngenuine content two\nCOOKIE NOTICE",
            ),
            (
                9000003,
                "SUBSCRIBE TO OUR NEWSLETTER\ngenuine content three\nCOOKIE NOTICE",
            ),
            (9000004, "SUBSCRIBE TO OUR NEWSLETTER"),
        ],
        "doc_id: long, text: string",
    )
    return dedup.line_dedup(d.unionByName(planted), min_df=3)


SQL_LINE_DEDUP = r"""
WITH src AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES
    (9000001, 'SUBSCRIBE TO OUR NEWSLETTER' || chr(10) ||
              'genuine content one' || chr(10) || 'COOKIE NOTICE'),
    (9000002, 'SUBSCRIBE TO OUR NEWSLETTER' || chr(10) ||
              'genuine content two' || chr(10) || 'COOKIE NOTICE'),
    (9000003, 'SUBSCRIBE TO OUR NEWSLETTER' || chr(10) ||
              'genuine content three' || chr(10) || 'COOKIE NOTICE'),
    (9000004, 'SUBSCRIBE TO OUR NEWSLETTER')
  ) v(doc_id, text)
), l AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos
  FROM src
), lf AS (
  SELECT doc_id, pos, line,
         ('0x' || substr(md5(line), 1, 15))::BIGINT AS lfp
  FROM l
), c AS (
  SELECT lfp, count(DISTINCT doc_id) AS line_df FROM lf GROUP BY 1
)
SELECT lf.doc_id,
       sum(CASE WHEN c.line_df < 3 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       sum(CASE WHEN c.line_df >= 3 THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
       coalesce(string_agg(CASE WHEN c.line_df < 3 THEN lf.line END,
                           chr(10) ORDER BY lf.pos), '') AS text
FROM lf JOIN c ON lf.lfp = c.lfp
GROUP BY lf.doc_id
"""


def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood blocking dedup (engine.spark.dedup.
    sorted_neighborhood_pairs): global sort on a 16-char normalized
    prefix key via the distributed-ranking helper (no single-reducer
    window), candidate pairs within 4 sort positions, integer-exact
    Jaccard ≥ 1/2 refine.  Planted rows 9000001-3 share the prefix
    'the quick brown ' so they sort adjacent and pass the refine;
    9000004 sorts elsewhere and pairs with nothing."""
    d = _spread(spark, _t(spark, sf_dir, "documents")).select("doc_id", "text")
    planted = spark.createDataFrame(
        [
            (9000001, "the quick brown fox jumps over the lazy dog"),
            (9000002, "the quick brown fox jumps over the lazy cat"),
            (9000003, "the quick brown fox leaps over the lazy dog"),
            (9000004, "zzz completely unrelated document text here"),
        ],
        "doc_id: long, text: string",
    )
    return dedup.sorted_neighborhood_pairs(
        d.unionByName(planted), window=4, threshold=(1, 2), key_len=16
    )


SQL_SORTED_NEIGHBORHOOD = r"""
WITH src AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES
    (9000001, 'the quick brown fox jumps over the lazy dog'),
    (9000002, 'the quick brown fox jumps over the lazy cat'),
    (9000003, 'the quick brown fox leaps over the lazy dog'),
    (9000004, 'zzz completely unrelated document text here')
  ) v(doc_id, text)
), r AS (
  SELECT doc_id,
         row_number() OVER (
           ORDER BY substr(lower(trim(text)), 1, 16), doc_id) AS rk
  FROM src
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, b.rk - a.rk AS rank_gap
  FROM r a JOIN r b ON b.rk > a.rk AND b.rk - a.rk <= 4
), tok AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)),
                  '[ \t\n\x0b\f\r]+')) AS tok
    FROM src
  ) WHERE tok <> ''
), sz AS (
  SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY 1
), sh AS (
  SELECT c.doc_a, c.doc_b, c.rank_gap, count(*) AS shared
  FROM cand c
  JOIN tok ta ON ta.doc_id = c.doc_a
  JOIN tok tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
  GROUP BY 1, 2, 3
)
SELECT sh.doc_a, sh.doc_b, sh.rank_gap, sh.shared,
       (za.n_tok + zb.n_tok - sh.shared) AS union_sz
FROM sh
JOIN sz za ON za.doc_id = sh.doc_a
JOIN sz zb ON zb.doc_id = sh.doc_b
WHERE 2 * sh.shared >= 1 * (za.n_tok + zb.n_tok - sh.shared)
"""


def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (α = 1/2) over event values (engine.spark.
    analytics.ewma): recursive fold replayed bit-identically by the
    DuckDB twin's recursive CTE — raw unrounded doubles on both sides
    because 0.5·x is a pure exponent shift and the one addition per
    step rounds identically under IEEE-754."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    return analytics.ewma(e)


SQL_EWMA = r"""
WITH RECURSIVE seq AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE user_id < 30
), rec AS (
  SELECT user_id, event_id, rn, value, value AS ewma
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.event_id, s.rn, s.value,
         0.5 * s.value + 0.5 * r.ewma AS ewma
  FROM seq s JOIN rec r ON s.user_id = r.user_id AND s.rn = r.rn + 1
)
SELECT user_id, event_id, value, ewma FROM rec
"""


def q_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """86-core of the user co-occurrence graph (engine.spark.analytics.
    k_core): iterative peeling to fixpoint.  At sf0.01 the peel runs a
    REAL multi-round cascade (alive sizes 149 → 147 → 144 → fixpoint,
    non-empty 144-node core — k chosen so the fixture exercises more
    than one round).  The DuckDB twin unrolls SIX fixed peel rounds:
    peeling is idempotent after the fixpoint, so any unroll depth ≥ the
    actual round count reproduces the fixpoint exactly."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "user_id",
    )
    edges = analytics.cooccurrence_edges(
        ev, ["event_type", "hour"], "user_id", max_group=64
    )
    return analytics.k_core(edges, k=86).orderBy("node")


def _sql_peel_round(i: int, k: int) -> str:
    prev = "eu" if i == 1 else f"e{i - 1}"
    return (
        f"a{i} AS MATERIALIZED (SELECT src AS node FROM {prev} "
        f"GROUP BY 1 HAVING count(*) >= {k}),\n"
        f"e{i} AS MATERIALIZED (SELECT p.* FROM {prev} p "
        f"JOIN a{i} x ON p.src = x.node "
        f"JOIN a{i} y ON p.dst = y.node),\n"
    )


SQL_K_CORE = (
    r"""
WITH g AS (
  SELECT DISTINCT event_type, date_trunc('hour', ts) AS h, user_id
  FROM events
), sz AS (
  SELECT event_type, h FROM g
  GROUP BY event_type, h HAVING count(*) <= 64
), c AS (
  SELECT g.* FROM g JOIN sz USING (event_type, h)
), e AS (
  SELECT DISTINCT a.user_id::BIGINT AS src, b.user_id::BIGINT AS dst
  FROM c a JOIN c b
    ON a.event_type = b.event_type AND a.h = b.h
   AND a.user_id < b.user_id
), eu AS MATERIALIZED (
  SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e
),
"""
    + "".join(_sql_peel_round(i, 86) for i in range(1, 7))
    + r"""
fin AS (SELECT 1)
SELECT src AS node, count(*) AS core_degree
FROM e6 GROUP BY 1 HAVING count(*) >= 86
ORDER BY node
"""
)


def q_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed linear quality classifier
    (engine.spark.text.hashed_classifier_score) over the documents
    table.  The model here is synthetic-but-deterministic: for every
    feature id present in the corpus, w_milli = md5-hash('w:'||fid)
    mod 2001 − 1000 ∈ [−1000, 1000] — so the oracle derives the SAME
    weights and the BIGINT dot product matches exactly.  Production
    use passes a real trained (fid, w_milli) table; the broadcast-join
    inference shape is identical."""
    d = _spread(spark, _t(spark, sf_dir, "documents")).select("doc_id", "text")
    toks = d.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), etext.WS)
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    fids = toks.select(
        (dedup.portable_hash60(F.col("tok")) % F.lit(1 << 20)).alias("fid")
    ).distinct()
    weights = fids.select(
        "fid",
        (
            dedup.portable_hash60(
                F.concat(F.lit("w:"), F.col("fid").cast("string"))
            )
            % 2001
            - 1000
        ).alias("w_milli"),
    )
    return etext.hashed_classifier_score(d, weights, n_buckets=1 << 20)


SQL_CLASSIFIER_SCORE = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)),
                '[ \t\n\x0b\f\r]+')) AS tok
  FROM documents
), t2 AS (
  SELECT doc_id, tok FROM tok WHERE tok <> ''
), f AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 15))::BIGINT % 1048576 AS fid,
         count(*) AS cnt
  FROM t2 GROUP BY 1, 2
), w AS (
  SELECT DISTINCT fid,
         ('0x' || substr(md5('w:' || fid), 1, 15))::BIGINT % 2001 - 1000
           AS w_milli
  FROM f
)
SELECT f.doc_id,
       sum(f.cnt)::BIGINT AS n_tokens,
       sum(f.cnt * w.w_milli)::BIGINT AS score_milli,
       sum(f.cnt * w.w_milli) > 0 AS label
FROM f JOIN w ON f.fid = w.fid
GROUP BY f.doc_id
"""


def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-distribution drift vs the global corpus
    (engine.spark.text.corpus_drift): exact DECIMAL total-variation
    numerators with the missing-token mass folded in algebraically —
    no outer join against the vocabulary."""
    return etext.corpus_drift(
        _t(spark, sf_dir, "documents").select("source", "text")
    )


SQL_CORPUS_DRIFT = r"""
WITH tok AS (
  SELECT source AS grp,
         unnest(regexp_split_to_array(trim(lower(text)),
                '[ \t\n\x0b\f\r]+')) AS tok
  FROM documents
), t2 AS (
  SELECT grp, tok FROM tok WHERE tok <> ''
), counts AS (
  SELECT grp, tok, count(*) AS c FROM t2 GROUP BY 1, 2
), gtok AS (
  SELECT tok, sum(c)::BIGINT AS g FROM counts GROUP BY 1
), n_grp AS (
  SELECT grp, sum(c)::BIGINT AS n_g FROM counts GROUP BY 1
), tot AS (
  SELECT sum(n_g)::BIGINT AS G FROM n_grp
), inner_sum AS (
  SELECT c2.grp, n.n_g, t.G,
         sum(abs(c2.c::DECIMAL(38,0) * t.G::DECIMAL(38,0)
                 - gl.g::DECIMAL(38,0) * n.n_g::DECIMAL(38,0))
             - gl.g::DECIMAL(38,0) * n.n_g::DECIMAL(38,0)) AS p
  FROM counts c2
  JOIN gtok gl ON c2.tok = gl.tok
  JOIN n_grp n ON c2.grp = n.grp
  CROSS JOIN tot t
  GROUP BY 1, 2, 3
)
SELECT grp AS source, n_g AS n_tokens,
       round((G::DECIMAL(38,0) * n_g::DECIMAL(38,0) + p)::DOUBLE
             / (2.0 * n_g::DOUBLE * G::DOUBLE), 6) AS tv
FROM inner_sum
"""


def q_value_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling of the events stream: per (event_type, hour),
    open = value of the earliest event, close = latest, plus min/max/
    count.  open/close are argmin/argmax by (ts, event_id) computed as
    struct-min/struct-max PARTIAL aggregates — the scale-safe
    first/last shape (mergeable map-side combine), never a per-group
    window sort.  No arithmetic — every output is a selected input
    value, so both engines agree bit-for-bit."""
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        "ts",
        "event_id",
        "value",
    )
    return e.groupBy("event_type", "bucket").agg(
        F.min(F.struct("ts", "event_id", "value"))
        .getField("value")
        .alias("open"),
        F.max(F.struct("ts", "event_id", "value"))
        .getField("value")
        .alias("close"),
        F.min("value").alias("low"),
        F.max("value").alias("high"),
        F.count("*").alias("n_obs"),
    )


SQL_VALUE_OHLC = r"""
WITH e AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, ts, event_id, value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, bucket,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       min(value) AS low, max(value) AS high,
       count(*)::BIGINT AS n_obs
FROM e GROUP BY 1, 2
"""


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (engine.spark.similarity.hard_negative_topk):
    top-k similar vectors per query EXCLUDING near-duplicates.  The
    corpus is augmented with exact clones of the first 50 vectors
    (vec_id + 100000) — every query's clone scores cosine 1.0 and
    would top plain brute-force top-k, so the dup exclusion (≥ 0.95)
    is what this contract row actually verifies."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    clones = e.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    out = similarity.hard_negative_topk(
        e.unionByName(clones), n_queries=8, k=5, dup_threshold=0.95
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


SQL_HARD_NEGATIVES = """
WITH raw AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), base AS (
  SELECT vec_id, v FROM raw
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, v FROM raw WHERE vec_id < 50
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id < 8
), scored AS (
  SELECT q.query_id, b.vec_id AS neighbor_id,
         round(list_inner_product(q.qv, b.v) /
               (sqrt(list_inner_product(q.qv, q.qv)) *
                sqrt(list_inner_product(b.v, b.v))), 6) AS cosine_sim
  FROM q JOIN base b ON b.vec_id != q.query_id
), kept AS (
  SELECT * FROM scored WHERE cosine_sim < 0.95
), ranked AS (
  SELECT query_id, neighbor_id, cosine_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, neighbor_id) AS rank
  FROM kept
)
SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked WHERE rank <= 5
"""


def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (5%-trimmed-to-cap) robust mean per event_type — the
    outlier-hardened aggregate a metrics pipeline uses instead of a raw
    mean.  The caps come from the DISTRIBUTED ranking op (ntile-20
    buckets via diagnose.distributed_ntile; cap_lo = max value of the
    bottom bucket, cap_hi = min value of the top bucket) — the same
    scale-safe composition as value_ntile, never an exact-percentile
    single-reducer buffer.  Values clamp to the caps (least/greatest,
    exact double selection) and only the final mean is a rounded
    double over a DECIMAL sum."""
    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    nt = diagnose.distributed_ntile(
        e, part_col="event_type", value_col="value", id_col="event_id",
        buckets=20,
    )
    j = e.join(nt.select("event_id", "bucket"), "event_id")
    caps = j.groupBy("event_type").agg(
        F.max(F.when(F.col("bucket") == 1, F.col("value"))).alias("cap_lo"),
        F.min(F.when(F.col("bucket") == 20, F.col("value"))).alias("cap_hi"),
    )
    c = j.join(F.broadcast(caps), "event_type").withColumn(
        "_w",
        F.least(F.greatest(F.col("value"), F.col("cap_lo")), F.col("cap_hi")),
    )
    return c.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min("cap_lo").alias("cap_lo"),
        F.min("cap_hi").alias("cap_hi"),
        F.round(
            F.sum(F.col("_w").cast("decimal(18,4)"))
            .cast("decimal(20,4)")
            .cast("double")
            / F.count("*").cast("double"),
            6,
        ).alias("winsorized_mean"),
    )


SQL_WINSORIZED_STATS = """
WITH nt AS (
  SELECT event_id, event_type, value,
         ntile(20) OVER (PARTITION BY event_type
                         ORDER BY value ASC, event_id ASC) AS bucket
  FROM events
), caps AS (
  SELECT event_type,
         max(CASE WHEN bucket = 1 THEN value END) AS cap_lo,
         min(CASE WHEN bucket = 20 THEN value END) AS cap_hi
  FROM nt GROUP BY 1
), c AS (
  SELECT nt.event_type,
         least(greatest(nt.value, caps.cap_lo), caps.cap_hi) AS w,
         caps.cap_lo, caps.cap_hi
  FROM nt JOIN caps USING (event_type)
)
SELECT event_type, count(*)::BIGINT AS n,
       min(cap_lo) AS cap_lo, min(cap_hi) AS cap_hi,
       round(CAST(CAST(sum(CAST(w AS DECIMAL(18,4))) AS DECIMAL(20,4))
             AS DOUBLE) / count(*)::DOUBLE, 6) AS winsorized_mean
FROM c GROUP BY 1
"""


# ------------------------------------------------- session-4 additions


def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO preference-pair construction (mix.preference_pairs): docs
    grouped 4-per-prompt, score = text length; the per-prompt argmax
    (struct-max, ties to the larger cand_id) is paired against every
    other candidate.  The oracle reproduces the tie rule via an
    encoded score*10^9+cand_id BIGINT max."""
    d = _t(spark, sf_dir, "documents").select(
        F.floor(F.col("doc_id") / 4).cast("long").alias("prompt_id"),
        F.col("doc_id").alias("cand_id"),
        F.length("text").cast("long").alias("score"),
    )
    return mix.preference_pairs(d).orderBy("prompt_id", "rejected_id")


SQL_PREFERENCE_PAIRS = """
WITH cands AS (
  SELECT doc_id // 4 AS prompt_id, doc_id AS cand_id,
         length(text)::BIGINT AS score
  FROM documents
), best AS (
  -- encoded (score, cand_id) max in HUGEINT: the 2^62 radix exceeds
  -- any BIGINT id, so the struct-max tie rule is reproduced without a
  -- magnitude bound on cand_id
  SELECT prompt_id,
         max(score::HUGEINT * 4611686018427387904 + cand_id) AS bk
  FROM cands GROUP BY prompt_id
)
SELECT c.prompt_id,
       (b.bk % 4611686018427387904)::BIGINT AS chosen_id,
       c.cand_id AS rejected_id,
       (b.bk // 4611686018427387904 - c.score)::BIGINT AS margin
FROM cands c JOIN best b USING (prompt_id)
WHERE c.cand_id <> (b.bk % 4611686018427387904)::BIGINT
ORDER BY prompt_id, rejected_id
"""

# planted users for item_cooccurrence: 9500001 exceeds the max_group=5
# cap (6 distinct types — dropped before pair generation, exercising
# the cap path on a corpus where every natural user has exactly 5);
# 9500002/9500003 add asymmetric pair counts and the 'refund' item.
_COOC_FIXTURE = [
    (9500001, t)
    for t in ("click", "error", "purchase", "signup", "view", "refund")
] + [
    (9500002, "click"),
    (9500002, "view"),
    (9500003, "view"),
    (9500003, "purchase"),
    (9500003, "refund"),
]


def q_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association stats (analytics.item_cooccurrence)
    over (user, event_type) baskets with max_group=5 — every natural
    sf user holds exactly 5 distinct types, so the planted 6-type user
    9500001 is the one the cap drops (FIXTURES.md)."""
    ev = (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .unionByName(
            spark.createDataFrame(
                _COOC_FIXTURE, "user_id: long, event_type: string"
            )
        )
    )
    return analytics.item_cooccurrence(
        ev, "user_id", "event_type", max_group=5
    ).orderBy("item_a", "item_b")


_SQL_COOC_FIXTURE = """
  SELECT * FROM (VALUES
    (9500001, 'click'), (9500001, 'error'), (9500001, 'purchase'),
    (9500001, 'signup'), (9500001, 'view'), (9500001, 'refund'),
    (9500002, 'click'), (9500002, 'view'),
    (9500003, 'view'), (9500003, 'purchase'), (9500003, 'refund')
  ) AS f(user_id, event_type)
"""

SQL_ITEM_COOCCURRENCE = f"""
WITH b AS (
  SELECT DISTINCT user_id, event_type FROM (
    SELECT user_id, event_type FROM events
    UNION ALL {_SQL_COOC_FIXTURE}
  )
), ok AS (
  SELECT user_id FROM b GROUP BY user_id HAVING count(*) <= 5
), capped AS (
  SELECT b.user_id, b.event_type FROM b JOIN ok USING (user_id)
), pairs AS (
  SELECT a.event_type AS item_a, c.event_type AS item_b,
         count(*)::BIGINT AS pair_n
  FROM capped a JOIN capped c
    ON a.user_id = c.user_id AND a.event_type < c.event_type
  GROUP BY 1, 2
), counts AS (
  SELECT event_type, count(*)::BIGINT AS n FROM capped GROUP BY 1
), tot AS (
  SELECT count(*)::BIGINT AS n_groups FROM ok
)
SELECT item_a, item_b, pair_n, ca.n AS a_n, cb.n AS b_n, tot.n_groups,
       pair_n::DOUBLE / ca.n::DOUBLE AS confidence,
       (pair_n * tot.n_groups)::DOUBLE / (ca.n * cb.n)::DOUBLE AS lift
FROM pairs
JOIN counts ca ON ca.event_type = item_a
JOIN counts cb ON cb.event_type = item_b
CROSS JOIN tot
ORDER BY item_a, item_b
"""


def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching stats (mix.length_buckets, bucket 32
    tokens) plus two planted edges: an empty doc (0 tokens — the
    blank-text guard) and an exactly-32-token doc (lower boundary of
    bucket 1; FIXTURES.md)."""
    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .unionByName(
            spark.createDataFrame(
                [(9600001, ""), (9600002, "tok " * 31 + "tok")],
                "doc_id: long, text: string",
            )
        )
    )
    return mix.length_buckets(d, bucket_size=32).orderBy("bucket")


SQL_LENGTH_BUCKETS = r"""
WITH d AS (
  SELECT text FROM documents
  UNION ALL
  SELECT * FROM (VALUES
    (''), ('{tok32}')
  ) AS f(text)
), t AS (
  SELECT CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text), '[ \t\n\x0b\f\r]+'))
         END::BIGINT AS n
  FROM d
), bk AS (
  SELECT ((n - n % 32) // 32)::BIGINT AS bucket, n FROM t
)
SELECT bucket, count(*)::BIGINT AS n_docs, sum(n)::BIGINT AS sum_tokens,
       max(n)::BIGINT AS max_tokens,
       (count(*) * max(n) - sum(n))::BIGINT AS pad_to_max,
       (count(*) * (bucket + 1) * 32 - sum(n))::BIGINT AS pad_to_cap
FROM bk GROUP BY bucket ORDER BY bucket
""".replace(
    "{tok32}", "tok " * 31 + "tok"
)


def q_contingency_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell chi-square contributions (diagnose.contingency_chi2)
    for event_type x (user_id % 2) — every float is a short chain of
    correctly-rounded IEEE ops on exact integers, identical per row in
    both engines; no cross-row float sum exists in the result."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.pmod(F.col("user_id"), F.lit(2)).cast("long").alias("segment"),
    )
    return diagnose.contingency_chi2(ev, "event_type", "segment").orderBy(
        "event_type", "segment"
    )


SQL_CONTINGENCY_CHI2 = """
WITH o AS (
  SELECT event_type, (user_id % 2)::BIGINT AS segment,
         count(*)::BIGINT AS observed
  FROM events GROUP BY 1, 2
), r AS (
  SELECT event_type, sum(observed)::BIGINT AS row_n FROM o GROUP BY 1
), c AS (
  SELECT segment, sum(observed)::BIGINT AS col_n FROM o GROUP BY 1
), tot AS (
  SELECT sum(observed)::BIGINT AS n_total FROM o
), cell AS (
  SELECT o.event_type, o.segment, o.observed, r.row_n, c.col_n,
         tot.n_total,
         (r.row_n * c.col_n)::DOUBLE / tot.n_total::DOUBLE AS expected
  FROM o JOIN r USING (event_type) JOIN c USING (segment) CROSS JOIN tot
)
SELECT event_type, segment, observed, row_n, col_n, n_total, expected,
       (observed::DOUBLE - expected) * (observed::DOUBLE - expected)
         / expected AS cell_chi2
FROM cell ORDER BY event_type, segment
"""


def q_corr_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between event-type value series
    aligned on hour buckets (diagnose.grouped_correlation): exact
    DECIMAL sufficient statistics, final r as a fixed-order IEEE chain
    — the cross-metric co-movement diagnostic."""
    ev = _t(spark, sf_dir, "events")
    return diagnose.grouped_correlation(
        ev,
        F.floor(F.unix_timestamp("ts") / 3600).cast("long"),
        "event_type",
        F.col("value"),
    ).orderBy("series_a", "series_b")


SQL_CORR_PAIRS = """
WITH per AS (
  SELECT floor(epoch(ts) / 3600)::BIGINT AS b, event_type AS s,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), pairs AS (
  SELECT x.s AS series_a, y.s AS series_b, x.v AS vx, y.v AS vy
  FROM per x JOIN per y ON x.b = y.b AND x.s < y.s
), agg AS (
  SELECT series_a, series_b, count(*) AS n,
         CAST(sum(vx) AS DECIMAL(38,6)) AS sx,
         CAST(sum(vy) AS DECIMAL(38,6)) AS sy,
         -- widen one operand past 18 digits so DuckDB multiplies on
         -- the exact hugeint path (Spark's decimal product is exact)
         CAST(sum(CAST(vx AS DECIMAL(19,6)) * vy) AS DECIMAL(38,6))
           AS sxy,
         CAST(sum(CAST(vx AS DECIMAL(19,6)) * vx) AS DECIMAL(38,6))
           AS sxx,
         CAST(sum(CAST(vy AS DECIMAL(19,6)) * vy) AS DECIMAL(38,6))
           AS syy
  FROM pairs GROUP BY 1, 2
), d AS (
  SELECT series_a, series_b, n,
         n::DOUBLE AS nd, sx::DOUBLE AS sxd, sy::DOUBLE AS syd,
         sxy::DOUBLE AS sxyd, sxx::DOUBLE AS sxxd, syy::DOUBLE AS syyd
  FROM agg WHERE n >= 2
)
SELECT series_a, series_b, n,
       round((nd * sxyd - sxd * syd)
             / (sqrt(nd * sxxd - sxd * sxd)
                * sqrt(nd * syyd - syd * syd)), 6) AS corr
FROM d
WHERE (nd * sxxd - sxd * sxd) > 0.0 AND (nd * syyd - syd * syd) > 0.0
ORDER BY series_a, series_b
"""


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth over 16 deterministic hash-ordered
    shards (text.vocab_growth): new distinct tokens per shard +
    cumulative vocabulary — reproducible across engines because shard
    assignment is the portable md5 hash."""
    return etext.vocab_growth(
        _spread(spark, _t(spark, sf_dir, "documents")), n_shards=16, seed="vg"
    ).orderBy("shard")


SQL_VOCAB_GROWTH = rf"""
WITH t AS (
  SELECT ({_H60.format(x="'vg:' || doc_id::VARCHAR")} % 16)::INT AS shard,
         unnest(regexp_split_to_array(trim(lower(text)),
                '[ \t\n\x0b\f\r]+')) AS tok
  FROM documents
), f AS (
  SELECT tok, min(shard) AS shard FROM t WHERE length(tok) > 0
  GROUP BY tok
), g AS (
  SELECT shard, count(*)::BIGINT AS new_tokens FROM f GROUP BY shard
)
SELECT shard, new_tokens,
       sum(new_tokens) OVER (ORDER BY shard
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
         AS cum_vocab
FROM g ORDER BY shard
"""


def q_mad_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust MAD outlier summary per event type (diagnose.mad_flags):
    both medians via distributed exact ranking (grouped_median — never
    a single-reducer percentile buffer or per-key window sort); the
    DuckDB twin recomputes the identical rank/average arithmetic with
    window functions (fine single-node, the shape Spark must avoid)."""
    return diagnose.mad_flags(
        _t(spark, sf_dir, "events"), "event_type", "value", "event_id"
    ).orderBy("event_type")


SQL_MAD_FLAGS = """
WITH v AS (
  SELECT event_type AS key, value AS val, event_id AS id
  FROM events WHERE value IS NOT NULL
), r AS (
  SELECT key, val,
         row_number() OVER (PARTITION BY key ORDER BY val, id) AS rk,
         count(*) OVER (PARTITION BY key) AS n
  FROM v
), med AS (
  SELECT key, max(n)::BIGINT AS n,
         sum(val) / count(*)::DOUBLE AS median
  FROM r WHERE rk = (n + 1) // 2 OR rk = n // 2 + 1 GROUP BY key
), d AS (
  SELECT v.key, abs(v.val - m.median) AS dev, v.id
  FROM v JOIN med m ON v.key = m.key
), r2 AS (
  SELECT key, dev,
         row_number() OVER (PARTITION BY key ORDER BY dev, id) AS rk,
         count(*) OVER (PARTITION BY key) AS n
  FROM d
), mad AS (
  SELECT key, sum(dev) / count(*)::DOUBLE AS mad
  FROM r2 WHERE rk = (n + 1) // 2 OR rk = n // 2 + 1 GROUP BY key
)
SELECT v.key AS event_type, max(med.n) AS n,
       round(max(med.median), 6) AS median,
       round(max(mad.mad), 6) AS mad,
       sum(CASE WHEN abs(v.val - med.median) > 3.0 * mad.mad
           THEN 1 ELSE 0 END)::BIGINT AS n_outliers
FROM v JOIN med ON v.key = med.key JOIN mad ON v.key = mad.key
GROUP BY v.key ORDER BY event_type
"""


def q_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid confusion matrix over the labeled embeddings
    (similarity.centroid_classify): per-label centroids as 6-dp-rounded
    per-dim means, fold-cosine assignment, argmax per vector — the
    embedding-separability audit."""
    return similarity.centroid_classify(
        _spread(spark, _t(spark, sf_dir, "embeddings"))
    ).orderBy("true_label", "pred_label")


SQL_CENTROID_CLASSIFY = """
WITH base AS (
  SELECT vec_id, label AS true_label, embedding::DOUBLE[] AS v
  FROM embeddings
), dims AS (
  SELECT true_label AS lbl, i AS d, v[i] AS x
  FROM base, UNNEST(range(1, len(v) + 1)) r(i)
), cent AS (
  SELECT lbl AS pred_label, list(m ORDER BY d) AS cv
  FROM (SELECT lbl, d, round(avg(x), 6) AS m FROM dims GROUP BY 1, 2)
  GROUP BY lbl
), scored AS (
  SELECT b.vec_id, b.true_label, c.pred_label,
         round(list_inner_product(b.v, c.cv)
               / (sqrt(list_inner_product(b.v, b.v))
                  * sqrt(list_inner_product(c.cv, c.cv))), 6) AS cos
  FROM base b, cent c
), pick AS (
  SELECT vec_id, true_label, pred_label,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, pred_label) AS rn
  FROM scored
)
SELECT true_label, pred_label, count(*)::BIGINT AS n
FROM pick WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training, 4 true merge rounds
    (text.bpe_train): corpus scanned once into a vocab-sized
    word-frequency table, each round = weighted pair count +
    TakeOrdered(1) argmax + a codegen'd greedy-leftmost string merge.
    The merge list is driver-side metadata (4 single-row round-trips,
    the CC-convergence discipline); the oracle twin unrolls the same 4
    rounds as CTE stages with DuckDB's identical non-overlapping
    replace."""
    merges = etext.bpe_train(
        _spread(spark, _t(spark, sf_dir, "documents")), rounds=4
    )
    return spark.createDataFrame(
        merges,
        "rnd: int, left_tok: string, right_tok: string,"
        " merged: string, cnt: long",
    ).orderBy("rnd")


def _bpe_sql(rounds: int = 4, encode: bool = False) -> str:
    bpe_re = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0b\f\r]"
    parts = [
        f"""
WITH words1 AS (
  SELECT array_to_string(regexp_extract_all(w, '.'), ' ') AS seq, freq
  FROM (
    SELECT w, count(*)::BIGINT AS freq FROM (
      SELECT unnest(regexp_extract_all(text, '{bpe_re}')) AS w
      FROM documents
    ) GROUP BY w
  )
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""
, pairs{r} AS (
  SELECT a[i] AS l, a[i+1] AS r2, sum(freq)::BIGINT AS cnt
  FROM (SELECT string_split(seq, ' ') AS a, freq FROM words{r}) s,
       UNNEST(range(1, len(a))) u(i)
  GROUP BY 1, 2
), top{r} AS (
  SELECT l, r2, cnt FROM pairs{r} ORDER BY cnt DESC, l, r2 LIMIT 1
)"""
        )
        if r < rounds or encode:
            # greedy-leftmost fold (same semantics as the Spark array
            # fold): acc is the space-joined merged prefix; merge when
            # its LAST symbol is l (suffix equals l and the char before
            # is a space, or acc IS l — substring checks, not LIKE, so
            # %/_ symbols can't act as wildcards) and x is r
            parts.append(
                f"""
, words{r + 1} AS (
  -- LEFT JOIN ON TRUE: when pair counts exhaust before the last round,
  -- top{r} is empty and a plain cross join would annihilate the word
  -- table (emptying the ENCODE oracle while Spark's early-broken train
  -- still encodes); identity-fold when no merge exists
  SELECT CASE WHEN t.l IS NULL THEN seq
         ELSE list_reduce(string_split(seq, ' '), (acc, x) ->
    CASE WHEN x = t.r2
           AND substr(acc, length(acc) - length(t.l) + 1) = t.l
           AND (length(acc) = length(t.l)
                OR substr(acc, length(acc) - length(t.l), 1) = ' ')
         THEN substr(acc, 1, length(acc) - length(t.l))
              || t.l || t.r2
         ELSE acc || ' ' || x END) END AS seq, freq
  FROM words{r} LEFT JOIN top{r} t ON TRUE
)"""
            )
    if encode:
        sel = (
            "SELECT symbol, sum(freq)::BIGINT AS cnt FROM ("
            f"SELECT unnest(string_split(seq, ' ')) AS symbol, freq "
            f"FROM words{rounds + 1}) GROUP BY symbol ORDER BY symbol"
        )
        return "".join(parts) + "\n" + sel
    sel = "\nUNION ALL\n".join(
        f"SELECT {r} AS rnd, l AS left_tok, r2 AS right_tok,"
        f" l || r2 AS merged, cnt FROM top{r}"
        for r in range(1, rounds + 1)
    )
    return "".join(parts) + "\n" + sel + "\nORDER BY rnd"


SQL_BPE_TRAIN = _bpe_sql(4)


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer ENCODE: train 4 merges, then apply them to the corpus
    (text.bpe_encode — merges composed as greedy folds over the
    DISTINCT word table, weighted by word frequency) and return the
    symbol-frequency table.  The oracle re-derives the merges AND the
    encoding entirely in SQL (the same unrolled CTEs as bpe_train plus
    one more fold stage)."""
    docs = _t(spark, sf_dir, "documents")
    merges = etext.bpe_train(docs, rounds=4)
    return etext.bpe_encode(docs, merges).orderBy("symbol")


SQL_BPE_ENCODE = _bpe_sql(4, encode=True)


def q_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point estimates (diagnose.cms_estimate) for the
    per-user event counts, users < 40 as the query keys — the
    mergeable frequency sketch completing the sketch family; the
    wrapping universal hash family is the portable md5 prefix, so the
    whole sketch is byte-reproducible in the oracle."""
    ev = _t(spark, sf_dir, "events")
    keys = ev.select("user_id").where(F.col("user_id") < 40).distinct()
    return diagnose.cms_estimate(
        ev, keys, "user_id", depth=4, width=256
    ).orderBy("key")


SQL_CMS_COUNTS = f"""
WITH h AS (
  SELECT {_H60.format(x="user_id::VARCHAR")} AS hh FROM events
), probes AS (
  SELECT d, (((hh * (2 * d + 1) + d * d) % 2147483647) % 256)::INT
           AS bucket
  FROM h, UNNEST([0, 1, 2, 3]) t(d)
), sk AS (
  SELECT d, bucket, count(*)::BIGINT AS cnt FROM probes GROUP BY 1, 2
), qk AS (
  SELECT DISTINCT user_id AS key FROM events WHERE user_id < 40
), qp AS (
  SELECT key, d,
         ((({_H60.format(x="key::VARCHAR")} * (2 * d + 1) + d * d)
           % 2147483647) % 256)::INT AS bucket
  FROM qk, UNNEST([0, 1, 2, 3]) t(d)
)
SELECT key, min(coalesce(cnt, 0))::BIGINT AS est
FROM qp LEFT JOIN sk USING (d, bucket)
GROUP BY key ORDER BY key
"""


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch conversion attribution
    (analytics.conversion_attribution): one user-keyed window carries
    the running first/last touch struct; the oracle is the independent
    inequality-join + arg_min/arg_max formulation (fine single-node,
    quadratic-per-user — the shape Spark avoids)."""
    return analytics.conversion_attribution(
        _t(spark, sf_dir, "events")
    ).orderBy("conversion_id")


SQL_ATTRIBUTION = """
WITH t AS (
  -- floor(epoch()): Spark's unix_timestamp TRUNCATES sub-second parts,
  -- a bare ::BIGINT cast would round and drift gaps by one second
  SELECT user_id, event_id AS tid, event_type AS ttype,
         floor(epoch(ts))::BIGINT AS sec
  FROM events WHERE event_type IN ('view', 'click')
), c AS (
  SELECT user_id, event_id AS conversion_id,
         floor(epoch(ts))::BIGINT AS sec
  FROM events WHERE event_type = 'purchase'
), j AS (
  SELECT c.conversion_id, c.user_id, c.sec AS csec,
         t.tid, t.ttype, t.sec,
         -- HUGEINT radix 2^62 > any BIGINT tid: (sec, tid) order is
         -- exact at any id scale, not just below 1e9
         t.sec::HUGEINT * 4611686018427387904 + t.tid AS k
  FROM c LEFT JOIN t ON t.user_id = c.user_id AND t.sec <= c.sec
)
SELECT conversion_id, user_id,
       arg_min(tid, k) AS first_touch_id,
       arg_min(ttype, k) AS first_touch_type,
       arg_max(tid, k) AS last_touch_id,
       arg_max(ttype, k) AS last_touch_type,
       (max(csec) - arg_max(sec, k))::BIGINT AS last_touch_gap_s
FROM j GROUP BY 1, 2 ORDER BY conversion_id
"""


def q_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance (lineage.agg_merge): the
    per-(user, event_type) rollup maintained as base(first half of the
    month) merged with delta(rest) — at 10^12 rows the history is
    never rescanned, only the |keys|-sized aggregate table joins the
    new batch's aggregate.  The oracle IS the from-scratch aggregate
    over the union: the mergeability invariance
    merge(agg(A), agg(B)) == agg(A ∪ B)."""
    ev = _t(spark, sf_dir, "events")
    cut = F.dayofmonth("ts") <= 15
    base = lineage.agg_snapshot(
        ev.where(cut), ["user_id", "event_type"], "value"
    )
    delta = lineage.agg_snapshot(
        ev.where(~cut), ["user_id", "event_type"], "value"
    )
    return (
        lineage.agg_merge(base, delta, ["user_id", "event_type"])
        .withColumn("sum_value", F.round(F.col("sum_value").cast("double"), 4))
        .orderBy("user_id", "event_type")
    )


SQL_AGG_MERGE = """
SELECT user_id, event_type, count(*)::BIGINT AS n,
       round(CAST(CAST(sum(CAST(value AS DECIMAL(18,6)))
             AS DECIMAL(38,6)) AS DOUBLE), 4) AS sum_value,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY 1, 2 ORDER BY user_id, event_type
"""


def q_stream_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous materialized-view maintenance
    (streaming.stream_agg_merge): the events table streamed in
    multiple micro-batches, each batch's per-key aggregate written as
    its own delta partition; the serving read re-merges the deltas.
    The store's serving read must equal the from-scratch aggregate —
    so this shares SQL_AGG_MERGE verbatim (split invariance IS the
    oracle)."""
    import shutil

    from engine.spark import streaming

    ev = _t(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="sam_src_")
    # two files => availableNow splits into micro-batches
    ev.where(F.dayofmonth("ts") <= 15).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    ev.where(F.dayofmonth("ts") > 15).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    ckpt = tempfile.mkdtemp(prefix="sam_ckpt_")
    store = tempfile.mkdtemp(prefix="sam_store_")
    shutil.rmtree(store)
    streaming.stream_agg_merge(
        spark, src, ckpt, store, ["user_id", "event_type"], "value"
    )
    return (
        streaming.read_agg_store(spark, store, ["user_id", "event_type"])
        .withColumn(
            "sum_value", F.round(F.col("sum_value").cast("double"), 4)
        )
        .orderBy("user_id", "event_type")
    )


def q_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight join-size estimation (diagnose.join_cardinality):
    exact |views ⋈ purchases on user_id| with the top-10 contributing
    users — the would-this-join-explode check run before committing a
    100 TB join strategy."""
    ev = _t(spark, sf_dir, "events")
    return diagnose.join_cardinality(
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "purchase"),
        "user_id",
        k=10,
    ).orderBy("rank")


SQL_JOIN_CARDINALITY = """
WITH ca AS (
  SELECT user_id AS key, count(*)::BIGINT AS a_n FROM events
  WHERE event_type = 'view' GROUP BY 1
), cb AS (
  SELECT user_id AS key, count(*)::BIGINT AS b_n FROM events
  WHERE event_type = 'purchase' GROUP BY 1
), prod AS (
  SELECT key, a_n, b_n, (a_n * b_n)::BIGINT AS out_rows
  FROM ca JOIN cb USING (key)
), tot AS (
  SELECT sum(out_rows)::BIGINT AS join_rows FROM prod
)
SELECT key, a_n, b_n, out_rows, tot.join_rows,
       round(out_rows::DOUBLE / tot.join_rows::DOUBLE, 6) AS share,
       row_number() OVER (ORDER BY out_rows DESC, key) AS rank
FROM prod, tot
QUALIFY rank <= 10 ORDER BY rank
"""


def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 2-D skyline (analytics.pareto_frontier): orders not
    dominated on (maximize o_totalprice, minimize o_orderdate) — the
    biggest-order-earliest frontier.  The classic sequential algorithm
    is a global running min over a total sort; the operator splits it
    into per-range-partition windows plus a broadcast prefix-min of
    partition boundary minima, so no single reducer ever sees the
    whole table."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    return analytics.pareto_frontier(
        o, "o_totalprice", "o_orderdate"
    ).orderBy(F.col("o_totalprice").desc(), "o_orderkey")


SQL_PARETO_FRONTIER = """
WITH g AS (
  SELECT o_totalprice AS x, min(o_orderdate) AS gy
  FROM orders GROUP BY 1
), s AS (
  SELECT x, gy,
         min(gy) OVER (ORDER BY x DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS mgt
  FROM g
)
SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate
FROM orders o JOIN s ON o.o_totalprice = s.x
WHERE o.o_orderdate = s.gy AND (s.mgt IS NULL OR s.gy < s.mgt)
ORDER BY o_totalprice DESC, o_orderkey
"""


def q_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded multi-source BFS (analytics.bfs_distance) over the same
    supplier↔customer trade graph as q_pagerank (customer ids offset
    by 100000), seeded at suppliers 1-5, 3 hops — the blast-radius
    query.  Each round is one frontier⋈edges join plus one anti-join
    against the settled set; the DuckDB twin is a recursive CTE capped
    at the same hop count."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_suppkey").cast("long").alias("s"),
        (F.col("o_custkey") + 100000).cast("long").alias("c"),
    )
    edges = j.select(F.col("s").alias("src"), F.col("c").alias("dst")).union(
        j.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    )
    seeds = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") <= 5)
        .select(F.col("s_suppkey").cast("long").alias("node"))
    )
    return analytics.bfs_distance(edges, seeds, max_hops=3).orderBy(
        "node"
    )


SQL_BFS_DISTANCE = """
WITH RECURSIVE trade AS (
  SELECT DISTINCT l_suppkey::BIGINT AS s,
         (o_custkey + 100000)::BIGINT AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), e AS (
  SELECT s AS src, c AS dst FROM trade
  UNION
  SELECT c AS src, s AS dst FROM trade
), bfs(node, dist) AS (
  SELECT s_suppkey::BIGINT AS node, 0 AS dist
  FROM supplier WHERE s_suppkey <= 5
  UNION
  SELECT e.dst, b.dist + 1
  FROM bfs b JOIN e ON b.node = e.src
  WHERE b.dist < 3
)
SELECT node, min(dist)::INT AS dist FROM bfs GROUP BY node
ORDER BY node
"""


def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average value (analytics.twap): each
    event's value holds until the user's next event, weights are exact
    BIGINT microseconds, value sums are DECIMAL(18,4) — one
    correctly-rounded division at the end, bit-identical to the DuckDB
    lead() twin."""
    ev = _t(spark, sf_dir, "events")
    return analytics.twap(ev).orderBy("user_id")


SQL_TWAP = """
WITH base AS (
  SELECT user_id,
         epoch_us(lead(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id))
           - epoch_us(ts) AS dur,
         CAST(value AS DECIMAL(18,4)) AS v
  FROM events WHERE value IS NOT NULL
)
SELECT user_id,
       count(*)::BIGINT AS n_intervals,
       sum(dur)::BIGINT AS span_us,
       round(CAST(sum(v * dur) AS DOUBLE)
             / CAST(sum(dur) AS DOUBLE), 4) AS twap
FROM base WHERE dur IS NOT NULL
GROUP BY user_id HAVING sum(dur) > 0
ORDER BY user_id
"""


WINDOW_FUNNEL_US = 7 * 24 * 3600 * 1_000_000  # 7 days


def q_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-capped funnel (analytics.window_funnel — the ClickHouse
    windowFunnel analog, EXACT exists-chain semantics): users reaching
    view→click→purchase at strictly increasing timestamps within 7
    days of the chain's first view.  The Spark side is a max-start DP
    folded over per-timestamp stage sets (one pass, JVM higher-order
    aggregate); the oracle is the independent k-way inequality-join
    EXISTS formulation."""
    ev = _t(spark, sf_dir, "events")
    return analytics.window_funnel(
        ev, ["view", "click", "purchase"], WINDOW_FUNNEL_US
    ).orderBy("level")


SQL_WINDOW_FUNNEL = f"""
WITH f AS (
  SELECT user_id, ts, event_type FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
),
l1 AS (SELECT DISTINCT user_id FROM f WHERE event_type = 'view'),
l2 AS (
  SELECT DISTINCT a.user_id
  FROM f a JOIN f b ON a.user_id = b.user_id
  WHERE a.event_type = 'view' AND b.event_type = 'click'
    AND b.ts > a.ts
    AND epoch_us(b.ts) - epoch_us(a.ts) <= {WINDOW_FUNNEL_US}
),
l3 AS (
  SELECT DISTINCT a.user_id
  FROM f a JOIN f b ON a.user_id = b.user_id
           JOIN f c ON a.user_id = c.user_id
  WHERE a.event_type = 'view' AND b.event_type = 'click'
    AND c.event_type = 'purchase'
    AND b.ts > a.ts AND c.ts > b.ts
    AND epoch_us(c.ts) - epoch_us(a.ts) <= {WINDOW_FUNNEL_US}
)
SELECT 1 AS level, 'view' AS event_type,
       (SELECT count(*) FROM l1)::BIGINT AS users
UNION ALL
SELECT 2, 'click', (SELECT count(*) FROM l2)::BIGINT
UNION ALL
SELECT 3, 'purchase', (SELECT count(*) FROM l3)::BIGINT
ORDER BY level
"""


def q_grouped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact-k sample PER STRATUM (diagnose.grouped_sample):
    5 docs per language by portable md5 hash rank, computed with the
    salted two-phase top-k so no reducer ever sorts a whole language's
    rows; membership is exactly the naive per-stratum rank's (the
    oracle IS the naive rank) and independent of the salt count."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return diagnose.grouped_sample(
        d, strata_col="lang", k=5, id_col="doc_id"
    ).orderBy("lang", "doc_id")


SQL_GROUPED_SAMPLE = r"""
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('g0:' || doc_id::VARCHAR) ASC, doc_id ASC
         ) AS r
  FROM documents
) WHERE r <= 5
ORDER BY lang, doc_id
"""


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-cluster-aware train/val/test split (mix.leakage_safe_split):
    MinHash pair graph → connected components → the portable hash of the
    CLUSTER id decides the side, so a whole duplicate family moves
    together and eval never scores a near-copy of a training doc.  The
    DuckDB twin re-labels components with the recursive-CTE min-label
    closure (independent algorithm) and re-derives the same bucket."""
    dd = _doubled_docs(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(dd, num_perm=32, bands=16)
    return (
        mix.leakage_safe_split(dd.select("doc_id"), pairs)
        .select("doc_id", "cluster_id", "split")
        .orderBy("doc_id")
    )


SQL_LEAKAGE_SPLIT = rf"""
WITH RECURSIVE pairs AS ({SQL_MINHASH_LSH}),
d AS ({_SQL_DOUBLED_DOCS}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(n, l) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.v, r.l FROM reach r JOIN edges e ON e.u = r.n WHERE r.l < e.v
),
cc AS (SELECT n AS doc_id, min(l) AS cluster_id FROM reach GROUP BY n),
lab AS (
  SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id
  FROM d LEFT JOIN cc USING (doc_id)
)
SELECT doc_id, cluster_id,
       CASE WHEN b < 90 THEN 'train'
            WHEN b < 95 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id, cluster_id,
         ('0x' || substr(md5('leak0:' || cluster_id::VARCHAR), 1, 15))::BIGINT
           % 100 AS b
  FROM lab
)
ORDER BY doc_id
"""


def q_incremental_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental connected components (dedup.incremental_clusters):
    the MinHash pair graph is split deterministically into an 'old'
    half (standing cluster table built from it) and a 'new' batch
    (merged in by label contraction — CC runs only on the contracted
    batch-sized graph, the corpus label table is touched by ONE
    equi-join).  The oracle is the from-scratch recursive-CTE closure
    over the FULL pair graph: the row-for-row match IS the
    incremental == from-scratch invariance."""
    dd = _doubled_docs(spark, sf_dir)
    # the pair graph feeds BOTH halves (old-cluster build and new
    # batch); a lazy local checkpoint materializes the MinHash
    # signature pipeline once per run instead of once per consumer —
    # within-query reuse, recomputed on every invocation
    pairs = dedup.minhash_lsh_pairs(dd, num_perm=32, bands=16).localCheckpoint(
        eager=False
    )
    parity = F.pmod(F.col("doc_a") + F.col("doc_b"), F.lit(2))
    clusters_old = dedup.dup_clusters(dd, pairs.filter(parity == 0))
    return dedup.incremental_clusters(
        dd.select("doc_id"), clusters_old, pairs.filter(parity == 1)
    ).orderBy("doc_id")


def q_stream_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained near-dup clusters
    (streaming.stream_dup_clusters): corpus = the original docs
    (bands + components seeded once), the exact twins arrive split
    across TWO micro-batches; each batch's pairs merge into the
    standing cluster store by label contraction.  The serving read —
    all docs left-joined against the latest store snapshot — must equal
    the from-scratch closure over the FULL pair graph, so this shares
    SQL_DUP_CLUSTERS verbatim (split-invariance + incremental ==
    from-scratch, in one row-for-row match)."""
    import shutil

    from engine.spark import streaming

    dd = _doubled_docs(spark, sf_dir)
    corpus = dd.filter(F.col("doc_id") < 1000000)
    twins = dd.filter(F.col("doc_id") >= 1000000)
    src = tempfile.mkdtemp(prefix="sdc_src_")
    # one file per write => maxFilesPerTrigger=1 makes them two batches
    twins.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 0).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    twins.filter(F.pmod(F.col("doc_id"), F.lit(2)) == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    ckpt = tempfile.mkdtemp(prefix="sdc_ckpt_")
    bstore = tempfile.mkdtemp(prefix="sdc_bands_")
    cstore = tempfile.mkdtemp(prefix="sdc_clusters_")
    shutil.rmtree(bstore)
    shutil.rmtree(cstore)
    streaming.stream_dup_clusters(
        spark, src, corpus, ckpt, bstore, cstore, num_perm=32, bands=16
    )
    store = streaming.read_cluster_store(spark, cstore)
    return (
        dd.select("doc_id")
        .join(store, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
        )
        .orderBy("doc_id")
    )


def q_url_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host URL rollup (text.url_host_stats): one codegen
    regexp_extract_all + explode, one partial-agg groupBy on host with
    a two-stage distinct for n_docs.  Planted rows carry the URLs (the
    synthetic corpus has none) including case-mixed hosts and repeated
    mentions, so normalization and both counters are value-checked."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = spark.createDataFrame(
        [
            (
                9100001,
                "see https://Example.COM/a then https://example.com/b "
                "plus http://sub.example.org",
            ),
            (9100002, "links: https://example.com and https://other.net/p?q=1"),
            (9100003, "no links in this document at all"),
        ],
        "doc_id: long, text: string",
    )
    return etext.url_host_stats(d.unionByName(planted)).orderBy("host")


SQL_URL_HOST_STATS = f"""
WITH src AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES
    (9100001, 'see https://Example.COM/a then https://example.com/b plus http://sub.example.org'),
    (9100002, 'links: https://example.com and https://other.net/p?q=1'),
    (9100003, 'no links in this document at all')
  ) v(doc_id, text)
), h AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{etext.URL_HOST_RE}', 1))
           AS host
  FROM src
)
SELECT host, count(*)::BIGINT AS n_urls,
       count(DISTINCT doc_id)::BIGINT AS n_docs
FROM h GROUP BY host ORDER BY host
"""


def q_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded weighted shortest paths (analytics.sssp_weighted) over
    the supplier↔customer trade graph of q_bfs_distance, edge weight =
    the cheapest lineitem quantity on that trade lane, seeds at
    suppliers 1-5, 3 relaxation rounds.  Delta-relaxation Bellman-Ford
    as dataflow; the DuckDB twin unrolls the same recurrence as three
    plain aggregate CTE levels (never a recursive CTE, whose frontier
    carries every distinct (node, dist) pair and explodes on dense
    graphs)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_suppkey").cast("long").alias("s"),
        (F.col("o_custkey") + 100000).cast("long").alias("c"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    edges = j.select(
        F.col("s").alias("src"), F.col("c").alias("dst"), "w"
    ).unionAll(j.select(F.col("c").alias("src"), F.col("s").alias("dst"), "w"))
    seeds = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") <= 5)
        .select(F.col("s_suppkey").cast("long").alias("node"))
    )
    return analytics.sssp_weighted(
        edges, seeds, max_hops=3, weight_col="w"
    ).orderBy("node")


SQL_SSSP_WEIGHTED = """
WITH trade AS (
  SELECT l_suppkey::BIGINT AS s, (o_custkey + 100000)::BIGINT AS c,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS (
  SELECT src, dst, min(w) AS w FROM (
    SELECT s AS src, c AS dst, w FROM trade
    UNION ALL SELECT c AS src, s AS dst, w FROM trade
  ) GROUP BY src, dst
), d0 AS (
  SELECT s_suppkey::BIGINT AS node, 0::BIGINT AS dist
  FROM supplier WHERE s_suppkey <= 5
), d1 AS (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM d0
    UNION ALL
    SELECT e.dst AS node, d.dist + e.w AS dist
    FROM d0 d JOIN edges e ON d.node = e.src
  ) GROUP BY node
), d2 AS (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM d1
    UNION ALL
    SELECT e.dst AS node, d.dist + e.w AS dist
    FROM d1 d JOIN edges e ON d.node = e.src
  ) GROUP BY node
), d3 AS (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM d2
    UNION ALL
    SELECT e.dst AS node, d.dist + e.w AS dist
    FROM d2 d JOIN edges e ON d.node = e.src
  ) GROUP BY node
)
SELECT node, dist FROM d3 ORDER BY node
"""


def q_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent open intervals per event type
    (analytics.concurrency_peak): each event opens a half-open
    interval of 1..3600 s derived deterministically from its value;
    the sweep-line prefix sum is DISTRIBUTED (range-partition + local
    cumsum + broadcast block offsets — never a per-type window over
    fact rows).  The DuckDB twin IS the per-type window running sum —
    the shape Spark must avoid — two derivations, same integers."""
    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    s_us = F.unix_micros(F.col("ts").cast("timestamp"))
    dur_s = F.floor(F.abs(F.col("value"))).cast("long") % 3600 + 1
    iv = ev.select(
        "event_type",
        s_us.alias("s_us"),
        (s_us + dur_s * 1000000).alias("e_us"),
        "event_id",
    )
    return analytics.concurrency_peak(
        iv, "event_type", "s_us", "e_us", "event_id"
    ).orderBy("event_type")


SQL_CONCURRENCY_PEAK = """
WITH iv AS (
  SELECT event_type AS k, epoch_us(ts) AS s,
         epoch_us(ts)
           + (CAST(floor(abs(value)) AS BIGINT) % 3600 + 1) * 1000000
           AS e,
         event_id AS i
  FROM events WHERE value IS NOT NULL
), d AS (
  SELECT k, s AS t, 1 AS d, i FROM iv
  UNION ALL SELECT k, e AS t, -1 AS d, i FROM iv
), r AS (
  SELECT k, t,
         sum(d) OVER (PARTITION BY k ORDER BY t, d, i
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM d
), p AS (
  SELECT k, max(run) AS peak FROM r GROUP BY k
)
SELECT r.k AS event_type, p.peak::BIGINT AS peak,
       min(r.t)::BIGINT AS at_us
FROM r JOIN p ON r.k = p.k AND r.run = p.peak
GROUP BY r.k, p.peak
ORDER BY event_type
"""


def q_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (diagnose.cuped_adjust):
    units = users, variant = user_id parity, covariate x / metric y =
    each user's exact DECIMAL value sums over even-/odd-id events
    (correlated halves — heavy users are heavy in both, so CUPED has
    real variance to remove).  Pooled θ from one window over the
    2-row per-variant aggregate; every float is a fixed-order IEEE
    chain on exact sums, mirrored verbatim in the DuckDB twin."""
    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    d6 = lambda c: c.cast("decimal(18,6)")
    units = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(F.col("event_id") % 2 == 0, d6(F.col("value")))
            ),
            F.lit(0),
        )
        .cast("decimal(18,6)")
        .alias("x"),
        F.coalesce(
            F.sum(
                F.when(F.col("event_id") % 2 == 1, d6(F.col("value")))
            ),
            F.lit(0),
        )
        .cast("decimal(18,6)")
        .alias("y"),
    ).select(
        F.when(F.col("user_id") % 2 == 0, F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("variant"),
        "x",
        "y",
    )
    return diagnose.cuped_adjust(units, "variant", "x", "y")


SQL_CUPED_ADJUST = """
WITH unit AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
         CAST(coalesce(sum(CASE WHEN event_id % 2 = 0
             THEN CAST(value AS DECIMAL(18,6)) END), 0)
           AS DECIMAL(18,6)) AS x,
         CAST(coalesce(sum(CASE WHEN event_id % 2 = 1
             THEN CAST(value AS DECIMAL(18,6)) END), 0)
           AS DECIMAL(18,6)) AS y
  FROM events WHERE value IS NOT NULL GROUP BY user_id
), per AS (
  SELECT variant, count(*) AS n,
         CAST(sum(x) AS DECIMAL(38,6)) AS sx,
         CAST(sum(y) AS DECIMAL(38,6)) AS sy,
         -- widen one operand past 18 digits so DuckDB multiplies on
         -- the exact hugeint path (the SQL_CORR_PAIRS trick)
         CAST(sum(CAST(x AS DECIMAL(19,6)) * y) AS DECIMAL(38,6)) AS sxy,
         CAST(sum(CAST(x AS DECIMAL(19,6)) * x) AS DECIMAL(38,6)) AS sxx,
         CAST(sum(CAST(y AS DECIMAL(19,6)) * y) AS DECIMAL(38,6)) AS syy
  FROM unit GROUP BY variant
), pooled AS (
  SELECT *, sum(n) OVER () AS np, sum(sx) OVER () AS sxp,
         sum(sy) OVER () AS syp, sum(sxy) OVER () AS sxyp,
         sum(sxx) OVER () AS sxxp
  FROM per
)
SELECT variant, n::BIGINT AS n,
  round(sy::DOUBLE / n::DOUBLE, 6) AS mean_y,
  round((np::DOUBLE * sxyp::DOUBLE - sxp::DOUBLE * syp::DOUBLE)
      / (np::DOUBLE * sxxp::DOUBLE - sxp::DOUBLE * sxp::DOUBLE), 6)
    AS theta,
  round(sy::DOUBLE / n::DOUBLE
      - ((np::DOUBLE * sxyp::DOUBLE - sxp::DOUBLE * syp::DOUBLE)
          / (np::DOUBLE * sxxp::DOUBLE - sxp::DOUBLE * sxp::DOUBLE))
        * (sx::DOUBLE / n::DOUBLE - sxp::DOUBLE / np::DOUBLE), 6)
    AS mean_y_cuped,
  round((n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)
      / (n::DOUBLE * n::DOUBLE), 6) AS var_y,
  round((n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)
        / (n::DOUBLE * n::DOUBLE)
      + ((np::DOUBLE * sxyp::DOUBLE - sxp::DOUBLE * syp::DOUBLE)
          / (np::DOUBLE * sxxp::DOUBLE - sxp::DOUBLE * sxp::DOUBLE))
        * ((np::DOUBLE * sxyp::DOUBLE - sxp::DOUBLE * syp::DOUBLE)
            / (np::DOUBLE * sxxp::DOUBLE - sxp::DOUBLE * sxp::DOUBLE))
        * ((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
            / (n::DOUBLE * n::DOUBLE))
      - 2.0 * ((np::DOUBLE * sxyp::DOUBLE - sxp::DOUBLE * syp::DOUBLE)
          / (np::DOUBLE * sxxp::DOUBLE - sxp::DOUBLE * sxp::DOUBLE))
        * ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
            / (n::DOUBLE * n::DOUBLE)), 6) AS var_y_cuped
FROM pooled ORDER BY variant
"""


def q_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers covering 80% of each nation's discounted revenue
    (analytics.cumulative_contribution): exact-rational threshold test
    on DECIMAL sums — den·(cum−v) < num·total — so the crossing
    supplier can't flip on float drift; windows run over the already-
    reduced (nation, supplier) rollup, never fact rows."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    j = li.join(
        F.broadcast(s.select("s_suppkey", "s_nationkey")),
        li.l_suppkey == F.col("s_suppkey"),
    ).join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return analytics.cumulative_contribution(
        j.select("n_name", "l_suppkey", rev.alias("rev")),
        "n_name",
        "l_suppkey",
        "rev",
        threshold_num=4,
        threshold_den=5,
    ).orderBy("n_name", "rank")


SQL_PARETO_SHARE = """
WITH per AS (
  SELECT n_name AS k, l_suppkey AS i,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
           AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name, l_suppkey
), ranked AS (
  SELECT k, i, v,
         row_number() OVER (PARTITION BY k ORDER BY v DESC, i ASC)
           AS rank,
         sum(v) OVER (PARTITION BY k ORDER BY v DESC, i ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(v) OVER (PARTITION BY k) AS total
  FROM per
)
SELECT k AS n_name, i AS l_suppkey,
       round(v::DOUBLE, 2) AS value, rank::INTEGER AS rank,
       round(cum::DOUBLE / total::DOUBLE, 6) AS cum_share
FROM ranked
WHERE CAST(5 AS DECIMAL(4,0)) * CAST(cum - v AS DECIMAL(28,4))
    < CAST(4 AS DECIMAL(4,0)) * CAST(total AS DECIMAL(28,4))
ORDER BY n_name, rank
"""


def q_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of hourly value sums per event type
    (diagnose.autocorrelation): pairs align on bucket arithmetic via a
    single role-explode + regroup — never a grain self-join (the
    duplicated-subtree rescan trap) — with corr_pairs' exact-DECIMAL /
    fixed-IEEE discipline.  The DuckDB twin is the independent
    self-join formulation."""
    ev = _t(spark, sf_dir, "events")
    return diagnose.autocorrelation(
        ev,
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600),
        F.col("value"),
        lag=1,
    ).orderBy("event_type")


SQL_AUTOCORRELATION = """
WITH per AS (
  SELECT event_type AS k, floor(epoch(ts) / 3600)::BIGINT AS b,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), pairs AS (
  SELECT x.k AS k, x.v AS vx, y.v AS vy
  FROM per x JOIN per y ON x.k = y.k AND y.b = x.b + 1
), agg AS (
  SELECT k, count(*) AS n,
         CAST(sum(vx) AS DECIMAL(38,6)) AS sx,
         CAST(sum(vy) AS DECIMAL(38,6)) AS sy,
         CAST(sum(CAST(vx AS DECIMAL(19,6)) * vy) AS DECIMAL(38,6))
           AS sxy,
         CAST(sum(CAST(vx AS DECIMAL(19,6)) * vx) AS DECIMAL(38,6))
           AS sxx,
         CAST(sum(CAST(vy AS DECIMAL(19,6)) * vy) AS DECIMAL(38,6))
           AS syy
  FROM pairs GROUP BY k
), d AS (
  SELECT k, n, n::DOUBLE AS nd, sx::DOUBLE AS sxd, sy::DOUBLE AS syd,
         sxy::DOUBLE AS sxyd, sxx::DOUBLE AS sxxd, syy::DOUBLE AS syyd
  FROM agg WHERE n >= 2
)
SELECT k AS event_type, 1::INTEGER AS lag, n,
       round((nd * sxyd - sxd * syd)
             / (sqrt(nd * sxxd - sxd * sxd)
                * sqrt(nd * syyd - syd * syd)), 6) AS acf
FROM d
WHERE (nd * sxxd - sxd * sxd) > 0.0 AND (nd * syyd - syd * syd) > 0.0
ORDER BY event_type
"""


def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-shift changepoint per event type over hourly value sums
    (diagnose.changepoint): the CUSUM deviation |S_t·n − t·S| scanned
    in exact integer-scaled DECIMAL, argmax ties to the earliest
    split; windows touch only the reduced hourly grain."""
    ev = _t(spark, sf_dir, "events")
    return diagnose.changepoint(
        ev,
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600),
        F.col("value"),
    ).orderBy("event_type")


SQL_CHANGEPOINT = """
WITH per AS (
  SELECT event_type AS k, floor(epoch(ts) / 3600)::BIGINT AS b,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), pre AS (
  SELECT k, b,
    CAST(sum(v) OVER (PARTITION BY k ORDER BY b
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS DECIMAL(28,4)) AS st,
    row_number() OVER (PARTITION BY k ORDER BY b)::BIGINT AS t,
    CAST(sum(v) OVER (PARTITION BY k) AS DECIMAL(28,4)) AS s_tot,
    count(*) OVER (PARTITION BY k)::BIGINT AS n
  FROM per
), scored AS (
  SELECT *,
    abs(CAST(st * CAST(n AS DECIMAL(10,0)) AS DECIMAL(38,4))
        - CAST(s_tot * CAST(t AS DECIMAL(10,0)) AS DECIMAL(38,4)))
      AS score
  FROM pre WHERE t < n
), best AS (
  SELECT k, max(score) AS mscore FROM scored GROUP BY k
), win AS (
  SELECT s.*, row_number() OVER (PARTITION BY s.k ORDER BY s.b) AS rn
  FROM scored s JOIN best USING (k)
  WHERE s.score = best.mscore
)
SELECT k AS event_type, b AS split_bucket, n AS n_buckets,
  round(st::DOUBLE / t::DOUBLE, 6) AS mean_left,
  round((s_tot - st)::DOUBLE / (n - t)::DOUBLE, 6) AS mean_right
FROM win WHERE rn = 1 ORDER BY event_type
"""


def q_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user
    (analytics.user_streaks): gaps-and-islands on the distinct
    (user, day-index) set, integer day arithmetic end-to-end, earliest
    longest streak's start day reported."""
    ev = _t(spark, sf_dir, "events")
    return analytics.user_streaks(ev).orderBy("user_id")


SQL_USER_STREAKS = """
WITH days AS (
  SELECT DISTINCT user_id,
         floor(epoch_us(ts) / 86400000000)::BIGINT AS day
  FROM events
), isl AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS island
  FROM days
), runs AS (
  SELECT user_id, island, count(*)::BIGINT AS len,
         min(day) AS start
  FROM isl GROUP BY user_id, island
)
, ranked AS (
  SELECT user_id, len, start,
         row_number() OVER (PARTITION BY user_id
           ORDER BY len DESC, start ASC) AS rn,
         sum(len) OVER (PARTITION BY user_id) AS tot,
         max(len) OVER (PARTITION BY user_id) AS mx
  FROM runs
)
SELECT user_id, tot::BIGINT AS n_active_days, mx::BIGINT AS max_streak,
       start::BIGINT AS best_streak_start
FROM ranked WHERE rn = 1 ORDER BY user_id
"""


def q_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier user-retention curve (analytics.survival_curve):
    lifetimes in integer days, censoring inside the trailing 5-day
    window; the cumulative product rides the round-then-sum device —
    per-factor ln(1−d/n) rounded to 9 dp, exact DECIMAL window sum,
    one exp at the end — so both engines land identical survival
    values; q=0 writes the −999 sentinel (exp underflows to exact
    0.0)."""
    ev = _t(spark, sf_dir, "events")
    return analytics.survival_curve(ev, censor_days=5).orderBy("t")


SQL_SURVIVAL_CURVE = """
WITH peru AS (
  SELECT user_id AS u,
         min(floor(epoch_us(ts) / 86400000000)::BIGINT) AS first_day,
         max(floor(epoch_us(ts) / 86400000000)::BIGINT) AS last_day
  FROM events GROUP BY user_id
), lives AS (
  SELECT last_day - first_day AS t,
         last_day <= (SELECT max(last_day) FROM peru) - 5 AS is_death
  FROM peru
), per_t AS (
  SELECT t, sum(CASE WHEN is_death THEN 1 ELSE 0 END)::BIGINT AS d,
         sum(CASE WHEN is_death THEN 0 ELSE 1 END)::BIGINT AS c
  FROM lives GROUP BY t
), risk AS (
  SELECT t, d, c,
    (sum(d + c) OVER ()
     - coalesce(sum(d + c) OVER (ORDER BY t
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
    )::BIGINT AS n_risk
  FROM per_t
), deaths AS (
  SELECT t, n_risk, d, c,
    CAST(CASE WHEN d = n_risk THEN -999.0
         ELSE round(ln(1.0 - d::DOUBLE / n_risk::DOUBLE), 9) END
      AS DECIMAL(18,9)) AS lnq
  FROM risk WHERE d > 0
)
SELECT t, n_risk, d, c,
  round(exp(CAST(sum(lnq) OVER (ORDER BY t
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)), 6)
    AS survival
FROM deaths ORDER BY t
"""


def q_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fightin'-Words distinctive terms per source
    (text.distinctive_terms): informative-Dirichlet log-odds z over
    exact BIGINT counts, corpus totals as window sums over the
    (source, term) grain — one token scan; top-5 per source with the
    (z desc, term) total order."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    return etext.distinctive_terms(
        d, "source", "text", k=5, alpha0=100.0, min_count=3
    ).orderBy("source", "rank")


SQL_DISTINCTIVE_TERMS = r"""
WITH d AS (SELECT source, text FROM documents WHERE doc_id < 500),
tok AS (
  SELECT source AS g,
         unnest(regexp_split_to_array(trim(lower(text)),
                '[ \t\n\x0b\f\r]+')) AS term
  FROM d
), gt AS (
  SELECT g, term, count(*)::BIGINT AS y FROM tok WHERE term != ''
  GROUP BY 1, 2
), grain AS (
  SELECT g, term, y,
         sum(y) OVER (PARTITION BY term) AS yw,
         sum(y) OVER () AS n
  FROM gt
), tot AS (
  SELECT g, sum(y) AS ns FROM gt GROUP BY g
), scored AS (
  SELECT grain.g, term, y,
    round((
      ln((y::DOUBLE + 100.0 * yw::DOUBLE / n::DOUBLE)
         / (ns::DOUBLE + 100.0 - y::DOUBLE
            - 100.0 * yw::DOUBLE / n::DOUBLE))
      - ln(((yw::DOUBLE - y::DOUBLE) + 100.0 * yw::DOUBLE / n::DOUBLE)
           / ((n::DOUBLE - ns::DOUBLE) + 100.0
              - (yw::DOUBLE - y::DOUBLE)
              - 100.0 * yw::DOUBLE / n::DOUBLE))
    ) / sqrt(1.0 / (y::DOUBLE + 100.0 * yw::DOUBLE / n::DOUBLE)
             + 1.0 / ((yw::DOUBLE - y::DOUBLE)
                      + 100.0 * yw::DOUBLE / n::DOUBLE)), 6) AS z
  FROM grain JOIN tot ON grain.g = tot.g
  WHERE yw >= 3
), ranked AS (
  SELECT g AS source, term, y, z,
         row_number() OVER (PARTITION BY g
           ORDER BY z DESC, term ASC) AS rank
  FROM scored
)
SELECT source, term, y, z, rank::INTEGER AS rank
FROM ranked WHERE rank <= 5 ORDER BY source, rank
"""


def q_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between five corpus slices
    (text.source_divergence): per-term contributions as fixed IEEE
    chains on exact counts, rounded to 12 dp and summed as exact
    DECIMAL (round-then-sum — vocabulary-order-free); shared token
    grain dedup'd by ReusedExchange; one full-outer equi-join on
    (term, pair) aligns the vectors with zero-fill."""
    d = _t(spark, sf_dir, "documents").where(
        F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    )
    return etext.source_divergence(d, "source", "text").orderBy(
        "source_a", "source_b"
    )


SQL_SOURCE_DIVERGENCE = r"""
WITH d AS (
  SELECT source, text FROM documents
  WHERE source IN ('src0','src1','src2','src3','src4')
), tok AS (
  SELECT source AS g,
         unnest(regexp_split_to_array(trim(lower(text)),
                '[ \t\n\x0b\f\r]+')) AS term
  FROM d
), gt AS (
  SELECT g, term, count(*)::BIGINT AS y FROM tok WHERE term != ''
  GROUP BY 1, 2
), tot AS (
  SELECT g, sum(y)::BIGINT AS n FROM gt GROUP BY g
), pairs AS (
  SELECT a.g AS sa, a.n AS na, b.g AS sb, b.n AS nb
  FROM tot a JOIN tot b ON a.g < b.g
), a_side AS (
  SELECT term, sa, sb, na, nb, y AS ya
  FROM gt JOIN pairs ON gt.g = pairs.sa
), b_side AS (
  SELECT term AS term2, sa AS sa2, sb AS sb2, na AS na2, nb AS nb2,
         y AS yb
  FROM gt JOIN pairs ON gt.g = pairs.sb
), m AS (
  SELECT coalesce(sa, sa2) AS sa, coalesce(sb, sb2) AS sb,
         coalesce(na, na2) AS na, coalesce(nb, nb2) AS nb,
         coalesce(ya, 0)::BIGINT AS ya, coalesce(yb, 0)::BIGINT AS yb
  FROM a_side FULL OUTER JOIN b_side
    ON term = term2 AND sa = sa2 AND sb = sb2
), c AS (
  SELECT sa, sb,
    CAST(round(
      CASE WHEN ya > 0 THEN 0.5 * ((ya::DOUBLE / na::DOUBLE)
        * ln((ya::DOUBLE / na::DOUBLE)
             / (0.5 * (ya::DOUBLE / na::DOUBLE
                       + yb::DOUBLE / nb::DOUBLE))))
      ELSE 0.0 END
      + CASE WHEN yb > 0 THEN 0.5 * ((yb::DOUBLE / nb::DOUBLE)
        * ln((yb::DOUBLE / nb::DOUBLE)
             / (0.5 * (ya::DOUBLE / na::DOUBLE
                       + yb::DOUBLE / nb::DOUBLE))))
      ELSE 0.0 END, 12) AS DECIMAL(18,12)) AS cw
  FROM m
)
SELECT sa AS source_a, sb AS source_b, count(*)::BIGINT AS n_terms,
       round(CAST(CAST(sum(cw) AS DECIMAL(38,12)) AS DOUBLE), 8) AS js
FROM c GROUP BY sa, sb ORDER BY source_a, source_b
"""


def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I(event_type; user segment) in nats
    (diagnose.mutual_information): marginals as window sums over the
    reduced cell table (one scan, the contingency_chi2 shape),
    per-cell contributions round-then-summed as exact DECIMAL."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 4).cast("long").alias("segment")
    )
    return diagnose.mutual_information(ev, "event_type", "segment")


SQL_MUTUAL_INFORMATION = """
WITH o AS (
  SELECT event_type AS x, (user_id % 4)::BIGINT AS y,
         count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
), cell AS (
  SELECT c, sum(c) OVER (PARTITION BY x) AS r,
         sum(c) OVER (PARTITION BY y) AS k,
         sum(c) OVER () AS n
  FROM o
), cw AS (
  SELECT CAST(round((c::DOUBLE / n::DOUBLE)
      * ln((c::DOUBLE * n::DOUBLE) / (r::DOUBLE * k::DOUBLE)), 12)
    AS DECIMAL(18,12)) AS cw, n
  FROM cell
)
SELECT count(*)::BIGINT AS n_cells, max(n)::BIGINT AS n_total,
       round(CAST(CAST(sum(cw) AS DECIMAL(38,12)) AS DOUBLE), 8) AS mi
FROM cw
"""


def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per nation (analytics.hhi_concentration):
    HHI and top-member share from exact DECIMAL Σv, Σv², max(v)
    partial aggs — two shuffles, no windows or joins past the
    broadcast dims."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    j = li.join(
        F.broadcast(s.select("s_suppkey", "s_nationkey")),
        li.l_suppkey == F.col("s_suppkey"),
    ).join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return analytics.hhi_concentration(
        j.select("n_name", "l_suppkey", rev.alias("rev")),
        "n_name",
        "l_suppkey",
        "rev",
    ).orderBy("n_name")


SQL_HHI_CONCENTRATION = """
WITH per AS (
  SELECT n_name AS k, l_suppkey AS i,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
           AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY 1, 2
), agg AS (
  SELECT k, count(*)::BIGINT AS n_members,
         CAST(sum(v) AS DECIMAL(38,4)) AS tot,
         CAST(sum(CAST(CAST(v AS DECIMAL(19,4)) * v AS DECIMAL(38,8)))
           AS DECIMAL(38,8)) AS ssq,
         max(v) AS mx
  FROM per GROUP BY k
)
SELECT k AS n_name, n_members,
       round(ssq::DOUBLE / (tot::DOUBLE * tot::DOUBLE), 6) AS hhi,
       round(mx::DOUBLE / tot::DOUBLE, 6) AS top_share
FROM agg WHERE tot > 0 ORDER BY n_name
"""


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 PMI collocations over adjacent bigrams
    (text.pmi_collocations): unigram marginals and the bigram total as
    window sums over the reduced bigram grain — one token scan, zero
    joins; (pmi desc, w1, w2) totalizes the top-k cut."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 400)
    return etext.pmi_collocations(d, "text", k=30, min_count=3)


SQL_PMI_COLLOCATIONS = r"""
WITH d AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)),
                               '[ \t\n\x0b\f\r]+') AS ts
  FROM documents WHERE doc_id < 400
), bg0 AS (
  SELECT ts[i] AS w1, ts[i + 1] AS w2 FROM (
    SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i FROM d
  )
), bigrams AS (
  SELECT w1, w2, count(*)::BIGINT AS c
  FROM bg0 WHERE w1 != '' AND w2 != '' GROUP BY 1, 2
), marg AS (
  SELECT w1, w2, c,
         sum(c) OVER (PARTITION BY w1) AS c1,
         sum(c) OVER (PARTITION BY w2) AS c2,
         sum(c) OVER () AS n
  FROM bigrams
)
SELECT w1, w2, c,
       round(ln((c::DOUBLE * n::DOUBLE) / (c1::DOUBLE * c2::DOUBLE)), 6)
         AS pmi
FROM marg WHERE c >= 3
ORDER BY pmi DESC, w1, w2 LIMIT 30
"""


def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit Benford audit of event values
    (diagnose.benford_audit): digit from the integer STRING of
    floor(|v|) — never floor(log10), whose IEEE log10(1000)=2.999…96
    bug misbins powers of ten; exact counts, broadcast total,
    per-digit χ² as fixed IEEE chains."""
    return diagnose.benford_audit(
        _t(spark, sf_dir, "events"), "value"
    ).orderBy("digit")


SQL_BENFORD_AUDIT = """
WITH iv AS (
  SELECT CAST(floor(abs(value)) AS BIGINT) AS iv FROM events
  WHERE value IS NOT NULL AND CAST(floor(abs(value)) AS BIGINT) >= 1
), d AS (
  SELECT CAST(substr(CAST(iv AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         count(*)::BIGINT AS observed
  FROM iv GROUP BY 1
), t AS (SELECT sum(observed)::BIGINT AS n_total FROM d)
SELECT digit, observed,
  round(observed::DOUBLE / n_total::DOUBLE, 6) AS ratio,
  round(log10(1.0 + 1.0 / digit::DOUBLE), 6) AS expected_ratio,
  round((observed::DOUBLE
           - log10(1.0 + 1.0 / digit::DOUBLE) * n_total::DOUBLE)
        * (observed::DOUBLE
           - log10(1.0 + 1.0 / digit::DOUBLE) * n_total::DOUBLE)
        / (log10(1.0 + 1.0 / digit::DOUBLE) * n_total::DOUBLE), 6)
    AS cell_chi2
FROM d CROSS JOIN t ORDER BY digit
"""


def q_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed trade-graph profile (analytics.degree_stats):
    supplier→customer lanes plus the return-flagged reverse lanes, so
    reciprocity is a real fraction; degrees from the deduped edge
    grain (ReusedExchange), reciprocity via one semi-join with the
    reversed edges."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_suppkey").cast("long").alias("s"),
        (F.col("o_custkey") + 100000).cast("long").alias("c"),
        "l_returnflag",
    )
    edges = j.select(F.col("s").alias("src"), F.col("c").alias("dst")).unionAll(
        j.where(F.col("l_returnflag") == "R").select(
            F.col("c").alias("src"), F.col("s").alias("dst")
        )
    )
    return analytics.degree_stats(edges)


SQL_DEGREE_STATS = """
WITH j AS (
  SELECT l_suppkey::BIGINT AS s, (o_custkey + 100000)::BIGINT AS c,
         l_returnflag
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT s AS src, c AS dst FROM j
    UNION ALL
    SELECT c AS src, s AS dst FROM j WHERE l_returnflag = 'R'
  )
), outd AS (SELECT src, count(*)::BIGINT AS d FROM e GROUP BY src),
ind AS (SELECT dst, count(*)::BIGINT AS d FROM e GROUP BY dst),
nn AS (SELECT count(*)::BIGINT AS n_nodes FROM
       (SELECT src AS node FROM e UNION SELECT dst FROM e)),
ne AS (SELECT count(*)::BIGINT AS n_edges FROM e),
rc AS (SELECT count(*)::BIGINT AS n_recip FROM e
       WHERE EXISTS (SELECT 1 FROM e r
                     WHERE r.src = e.dst AND r.dst = e.src))
SELECT n_nodes, n_edges,
       (SELECT max(d) FROM outd)::BIGINT AS max_out,
       (SELECT max(d) FROM ind)::BIGINT AS max_in,
       round(n_edges::DOUBLE / n_nodes::DOUBLE, 6) AS avg_degree,
       round(n_recip::DOUBLE / n_edges::DOUBLE, 6) AS reciprocity
FROM ne CROSS JOIN nn CROSS JOIN rc
"""


def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase latency histogram (analytics.conversion_latency):
    first-touch anchoring, exact BIGINT microsecond latencies, 6-hour
    integer buckets, per-bucket exact-sum stats."""
    return analytics.conversion_latency(
        _t(spark, sf_dir, "events"), "signup", "purchase", bucket_s=21600
    ).orderBy("bucket")


SQL_CONVERSION_LATENCY = """
WITH a AS (
  SELECT user_id AS u, min(epoch_us(ts)) AS ta FROM events
  WHERE event_type = 'signup' GROUP BY 1
), b AS (
  SELECT user_id AS u, epoch_us(ts) AS tb FROM events
  WHERE event_type = 'purchase'
), lat AS (
  SELECT b.u, min(tb - ta) AS lat_us
  FROM b JOIN a ON b.u = a.u WHERE tb > ta GROUP BY b.u
)
SELECT lat_us // 21600000000 AS bucket, count(*)::BIGINT AS n,
  round(min(lat_us)::DOUBLE / 1e6, 6) AS min_s,
  round(max(lat_us)::DOUBLE / 1e6, 6) AS max_s,
  round(sum(lat_us)::DOUBLE / count(*)::DOUBLE / 1e6, 6) AS mean_s
FROM lat GROUP BY 1 ORDER BY bucket
"""


def q_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily stickiness DAU/MAU-30 (analytics.dau_mau): the sliding
    COUNT DISTINCT decomposed by contribution-explode over the deduped
    (user, day) grain — bounded ×30 fan-out, partial-aggregated, never
    a per-day self-join; integer day arithmetic end-to-end."""
    return analytics.dau_mau(
        _t(spark, sf_dir, "events"), window_days=30
    ).orderBy("day")


SQL_DAU_MAU = """
WITH act AS (
  SELECT DISTINCT user_id AS u,
         floor(epoch_us(ts) / 86400000000)::BIGINT AS day
  FROM events
), bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM act),
cover AS (
  SELECT DISTINCT c.u, c.wend
  FROM (SELECT u, unnest(generate_series(day, day + 29)) AS wend
        FROM act) c
  CROSS JOIN bounds WHERE c.wend BETWEEN d0 AND d1
),
mau AS (SELECT wend AS day, count(*)::BIGINT AS mau FROM cover GROUP BY 1),
dau AS (SELECT day, count(*)::BIGINT AS dau FROM act GROUP BY 1)
SELECT m.day, coalesce(d.dau, 0)::BIGINT AS dau, m.mau,
       round(coalesce(d.dau, 0)::DOUBLE / m.mau::DOUBLE, 6)
         AS stickiness
FROM mau m LEFT JOIN dau d ON m.day = d.day ORDER BY m.day
"""


def q_gini_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue inequality per nation (analytics.gini_index): Lorenz-
    rank formula over the reduced (nation, supplier) rollup, Σr·v as
    exact DECIMAL(29,4) products, the final G one fixed IEEE chain."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    j = li.join(
        F.broadcast(s.select("s_suppkey", "s_nationkey")),
        li.l_suppkey == F.col("s_suppkey"),
    ).join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return analytics.gini_index(
        j.select("n_name", "l_suppkey", rev.alias("rev")),
        "n_name",
        "l_suppkey",
        "rev",
    ).orderBy("n_name")


SQL_GINI_INDEX = """
WITH per AS (
  SELECT n_name AS k, l_suppkey AS i,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
           AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY 1, 2
), ranked AS (
  SELECT k, v,
         row_number() OVER (PARTITION BY k ORDER BY v ASC, i ASC) AS r
  FROM per WHERE v >= 0
), agg AS (
  SELECT k, count(*)::BIGINT AS n,
         CAST(sum(v) AS DECIMAL(38,4)) AS sv,
         CAST(sum(CAST(CAST(r AS DECIMAL(10,0)) * v AS DECIMAL(38,4)))
           AS DECIMAL(38,4)) AS srv
  FROM ranked GROUP BY k
)
SELECT k AS n_name, n AS n_members,
       round((2.0 * srv::DOUBLE - (n::DOUBLE + 1.0) * sv::DOUBLE)
             / (n::DOUBLE * sv::DOUBLE), 6) AS gini
FROM agg WHERE sv > 0 ORDER BY n_name
"""


def q_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week load surface per event type
    (diagnose.seasonality_profile): epoch-anchored integer dow/hour
    cells, exact-DECIMAL means, cell-to-key ratio as one fixed chain;
    key totals as window sums over the ≤168-cell grain."""
    return diagnose.seasonality_profile(
        _t(spark, sf_dir, "events"), "event_type", "ts", F.col("value")
    ).orderBy("event_type", "dow", "hour")


SQL_SEASONALITY_PROFILE = """
WITH cells AS (
  SELECT event_type AS k,
         (floor(epoch_us(ts) / 86400000000)::BIGINT % 7)::INTEGER
           AS dow,
         (floor(epoch_us(ts) / 3600000000)::BIGINT % 24)::INTEGER
           AS hour,
         count(*)::BIGINT AS n,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sv
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3
), fcells AS (
  SELECT *, sum(n) OVER (PARTITION BY k) AS nk,
         CAST(sum(sv) OVER (PARTITION BY k) AS DECIMAL(38,6)) AS svk
  FROM cells
)
SELECT k AS event_type, dow, hour, n,
  round(sv::DOUBLE / n::DOUBLE, 6) AS mean_value,
  round((sv::DOUBLE / n::DOUBLE) / (svk::DOUBLE / nk::DOUBLE), 6)
    AS ratio
FROM fcells ORDER BY event_type, dow, hour
"""


def q_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 length-3 behavioral paths (analytics.path_trigrams):
    two leads in one user-keyed window, partial agg on the bounded
    triple key, TakeOrdered top-k; (ts, event_id) totalizes the
    per-user order."""
    return analytics.path_trigrams(_t(spark, sf_dir, "events"), k=20)


SQL_PATH_TRIGRAMS = """
WITH t AS (
  SELECT event_type AS t1,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t1, t2, t3, count(*)::BIGINT AS n
FROM t WHERE t2 IS NOT NULL AND t3 IS NOT NULL
GROUP BY 1, 2, 3 ORDER BY n DESC, t1, t2, t3 LIMIT 20
"""


def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event burstiness per user (analytics.burstiness): exact
    BIGINT-microsecond gaps, Σg/Σg² as exact DECIMALs, Goh-Barabási
    B = (σ−μ)/(σ+μ) as one fixed IEEE chain."""
    return analytics.burstiness(
        _t(spark, sf_dir, "events"), min_gaps=5
    ).orderBy("user_id")


SQL_BURSTINESS = """
WITH g AS (
  SELECT user_id,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
           ORDER BY ts, event_id) - epoch_us(ts) AS g
  FROM events
), a AS (
  SELECT user_id, count(*)::BIGINT AS n,
         CAST(sum(CAST(g AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS s,
         CAST(sum(CAST(CAST(g AS DECIMAL(19,0))
                       * CAST(g AS DECIMAL(18,0)) AS DECIMAL(38,0)))
           AS DECIMAL(38,0)) AS ssq
  FROM g WHERE g IS NOT NULL GROUP BY 1
)
SELECT user_id, n AS n_gaps,
  round((s::DOUBLE / n::DOUBLE) / 1e6, 6) AS mean_gap_s,
  round((sqrt((n::DOUBLE * ssq::DOUBLE - s::DOUBLE * s::DOUBLE)
              / (n::DOUBLE * n::DOUBLE)) - s::DOUBLE / n::DOUBLE)
      / (sqrt((n::DOUBLE * ssq::DOUBLE - s::DOUBLE * s::DOUBLE)
              / (n::DOUBLE * n::DOUBLE)) + s::DOUBLE / n::DOUBLE), 6)
    AS burstiness
FROM a WHERE n >= 5 ORDER BY user_id
"""


def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type audience Venn matrix (analytics.audience_overlap):
    pairs generated inside per-user sorted type arrays (one scan, no
    self-join), sizes broadcast back; the DuckDB twin IS the
    (user,type) self-join — two derivations, same integers."""
    return analytics.audience_overlap(
        _t(spark, sf_dir, "events")
    ).orderBy("type_a", "type_b")


SQL_AUDIENCE_OVERLAP = """
WITH ut AS (
  SELECT DISTINCT user_id AS u, event_type AS t FROM events
), sizes AS (
  SELECT t, count(*)::BIGINT AS sz FROM ut GROUP BY t
), pairs AS (
  SELECT a.t AS type_a, b.t AS type_b, count(*)::BIGINT AS n_both
  FROM ut a JOIN ut b ON a.u = b.u AND a.t < b.t
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_both, sa.sz AS n_a, sb.sz AS n_b,
  round(n_both::DOUBLE / (sa.sz + sb.sz - n_both)::DOUBLE, 6)
    AS jaccard
FROM pairs
JOIN sizes sa ON type_a = sa.t
JOIN sizes sb ON type_b = sb.t
ORDER BY type_a, type_b
"""


def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24-observation z-score anomalies per user
    (diagnose.rolling_zscore): exact DECIMAL frame sums, flag cut on
    the ROUNDED z so the boundary is engine-exact."""
    return diagnose.rolling_zscore(
        _t(spark, sf_dir, "events"),
        "user_id",
        "ts",
        "event_id",
        "value",
        window=24,
        min_n=5,
        threshold=2.0,
    ).orderBy("user_id", "event_id")


SQL_ROLLING_ZSCORE = """
WITH b AS (
  SELECT user_id, event_id, ts, value,
    count(value) OVER w AS n,
    CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w
      AS DECIMAL(38,6)) AS s,
    CAST(sum(CAST(CAST(value AS DECIMAL(19,6))
                  * CAST(value AS DECIMAL(18,6)) AS DECIMAL(38,6)))
      OVER w AS DECIMAL(38,6)) AS ssq
  FROM events WHERE value IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
), z AS (
  SELECT user_id, event_id, ts, value,
    (n::DOUBLE * ssq::DOUBLE - s::DOUBLE * s::DOUBLE)
      / (n::DOUBLE * n::DOUBLE) AS var,
    round((value - s::DOUBLE / n::DOUBLE)
          / sqrt((n::DOUBLE * ssq::DOUBLE - s::DOUBLE * s::DOUBLE)
                 / (n::DOUBLE * n::DOUBLE)), 6) AS z
  FROM b WHERE n >= 5
)
SELECT user_id, event_id, ts, value, z
FROM z WHERE var > 0 AND abs(z) >= 2.0
ORDER BY user_id, event_id
"""


def q_stream_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of rolling_zscore
    (streaming.stream_rolling_anomaly, applyInPandasWithState): the
    events table is staged as three time-ranged shards fed one per
    micro-batch; every row scores against only its past, so the
    stream output over the in-order feed equals the batch operator
    EXACTLY — the oracle is the shared batch SQL, no trailing-openness
    carve-out.  The stateful fn re-derives the batch's decimal
    quantizations from the raw doubles, so z values are
    bit-identical."""
    import glob
    import os
    import shutil

    from engine.spark import streaming

    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    b = ev.agg(F.min("ts").alias("t0"), F.max("ts").alias("t1")).collect()[0]
    span = (b.t1 - b.t0) / 3
    cut1, cut2 = b.t0 + span, b.t0 + 2 * span
    parts = [
        ev.where(F.col("ts") <= F.lit(cut1)),
        ev.where((F.col("ts") > F.lit(cut1)) & (F.col("ts") <= F.lit(cut2))),
        ev.where(F.col("ts") > F.lit(cut2)),
    ]
    src = tempfile.mkdtemp(prefix="anom_src_")
    for i, p in enumerate(parts):
        d = tempfile.mkdtemp(prefix="anom_part_")
        p.coalesce(1).write.mode("overwrite").parquet(d)
        dest = f"{src}/batch-{i}.parquet"
        shutil.copy(glob.glob(f"{d}/part-*.parquet")[0], dest)
        os.utime(dest, (1_000_000_000 + i * 10, 1_000_000_000 + i * 10))
        shutil.rmtree(d, ignore_errors=True)
    ckpt = tempfile.mkdtemp(prefix="anom_ckpt_")
    sink = f"stream_anom_{uuid.uuid4().hex[:8]}"
    out = streaming.stream_rolling_anomaly(
        spark, src, ckpt, sink_table=sink, max_files_per_trigger=1
    )
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(src, ignore_errors=True)  # staged source, drained
    return out.orderBy("user_id", "event_id")


def q_epoch_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-recipe repeat factors per document (mix.epoch_budget):
    integer full passes + a hash-selected fractional pass whose
    expected token mass equals the remainder; the decision is one
    exact-integer-ratio compare against the portable-hash uniform —
    byte-identical across engines and cluster sizes."""
    d = _t(spark, sf_dir, "documents").where(
        F.col("source").isin("src0", "src1", "src2")
    ).select(
        "source",
        "doc_id",
        F.when(F.trim("text") == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), etext.WS)))
        .alias("n_tokens"),
    )
    return mix.epoch_budget(
        d, {"src0": 50000, "src1": 20000, "src2": 5000}
    ).orderBy("source", "doc_id")


SQL_EPOCH_BUDGET = f"""
WITH d AS (
  SELECT source, doc_id,
    CASE WHEN trim(text) = '' THEN 0
         ELSE len(regexp_split_to_array(trim(text),
                  '[ \\t\\n\\x0b\\f\\r]+')) END AS n_tokens
  FROM documents WHERE source IN ('src0', 'src1', 'src2')
), act AS (
  SELECT source, sum(n_tokens)::BIGINT AS actual FROM d GROUP BY source
), t(source, target) AS (
  VALUES ('src0', 50000), ('src1', 20000), ('src2', 5000)
), r AS (
  SELECT act.source, actual, target,
         target // actual AS rep,
         target - (target // actual) * actual AS frac_target
  FROM act JOIN t ON act.source = t.source
)
SELECT d.source, doc_id, n_tokens::BIGINT AS n_tokens,
  (rep + CASE WHEN {_H60.format(x="'epoch:' || doc_id::VARCHAR")}
                   / 1152921504606846976.0
                 < frac_target::DOUBLE / actual::DOUBLE
         THEN 1 ELSE 0 END)::BIGINT AS n_repeats
FROM d JOIN r ON d.source = r.source
ORDER BY d.source, doc_id
"""


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag
    (diagnose.weighted_median): distributed ranking over the range-
    partitioned fact — never a per-flag window sort (low-card reducer
    trap); the crossing row found by exact BIGINT 2·cum vs W compares.
    The DuckDB twin IS the per-key window cumsum Spark avoids."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
        "l_quantity",
    )
    return diagnose.weighted_median(
        li, "l_returnflag", "l_extendedprice", "rid", "l_quantity"
    ).orderBy("l_returnflag")


SQL_WEIGHTED_MEDIAN = """
WITH r AS (
  SELECT l_returnflag AS k, l_extendedprice AS v,
         l_orderkey * 10 + l_linenumber AS i,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem WHERE CAST(l_quantity AS BIGINT) > 0
), c AS (
  SELECT k, v, w,
    sum(w) OVER (PARTITION BY k ORDER BY v, i
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    sum(w) OVER (PARTITION BY k) AS tot
  FROM r
)
SELECT k AS l_returnflag, tot::BIGINT AS total_w, v AS median
FROM c WHERE 2 * cum >= tot AND 2 * (cum - w) < tot
ORDER BY l_returnflag
"""


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document trigram novelty vs everything earlier in corpus
    order (text.ngram_novelty): each distinct gram charges its first
    owner; one tokenize scan (ReusedExchange), one min-agg, one
    gram-keyed join back, one rollup."""
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 400)
    return etext.ngram_novelty(d, n=3).orderBy("doc_id")


SQL_NGRAM_NOVELTY = r"""
WITH toks AS (
  SELECT doc_id AS d,
         regexp_split_to_array(trim(lower(text)),
                               '[ \t\n\x0b\f\r]+') AS ts
  FROM documents WHERE doc_id < 400
), grams AS (
  SELECT DISTINCT d,
         array_to_string(ts[i : i + 2], chr(31)) AS g
  FROM (
    SELECT d, ts, unnest(generate_series(1, len(ts) - 2)) AS i
    FROM toks WHERE len(ts) >= 3
  )
), fst AS (
  SELECT g, min(d) AS first_d FROM grams GROUP BY g
)
SELECT grams.d AS doc_id, count(*)::BIGINT AS n_grams,
  sum(CASE WHEN first_d = grams.d THEN 1 ELSE 0 END)::BIGINT
    AS n_novel,
  round(sum(CASE WHEN first_d = grams.d THEN 1 ELSE 0 END)::DOUBLE
        / count(*)::DOUBLE, 6) AS novelty
FROM grams JOIN fst USING (g)
GROUP BY grams.d ORDER BY doc_id
"""


def q_csv_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE CSV ingestion with corrupt-row quarantine
    (pipeline.csv_ingest_quarantine): the events table round-trips
    through CSV on the micro-grid integer lane (floor(v·1e6+0.5) —
    no float formatting crosses the text format), three planted
    type-mismatch rows land in quarantine instead of killing the
    load; the oracle recomputes the clean aggregate straight from the
    events view plus the planted corrupt count."""
    import shutil

    from engine.spark import pipeline as epipeline

    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    iv = F.floor(F.col("value") * 1e6 + 0.5).cast("long")
    src = tempfile.mkdtemp(prefix="csv_ingest_")
    shutil.rmtree(src)
    ev.select(
        F.col("event_id").cast("long"),
        F.col("user_id").cast("long"),
        iv.alias("iv"),
    ).write.mode("overwrite").option("header", "false").csv(src)
    with open(f"{src}/zzz-bad.csv", "w") as f:
        f.write("x1,y1,z1\nx2,y2,z2\nx3,y3,z3\n")
    clean, quarantine = epipeline.csv_ingest_quarantine(
        spark, src, "event_id BIGINT, user_id BIGINT, iv BIGINT"
    )
    c = clean.agg(
        F.count("*").alias("n_rows"),
        F.sum("iv").cast("long").alias("sum_iv"),
    ).select(F.lit("clean").alias("status"), "n_rows", "sum_iv")
    q = quarantine.agg(F.count("*").alias("n_rows")).select(
        F.lit("corrupt").alias("status"),
        "n_rows",
        F.lit(None).cast("long").alias("sum_iv"),
    )
    return c.unionByName(q).orderBy("status")


SQL_CSV_INGEST = """
SELECT 'clean' AS status, count(*)::BIGINT AS n_rows,
       sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT))::BIGINT AS sum_iv
FROM events WHERE value IS NOT NULL
UNION ALL
SELECT 'corrupt', 3, NULL
ORDER BY status
"""


def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust hourly trend per event type
    (diagnose.theil_sen): pairwise slopes + median inside per-key
    sorted arrays (no self-join, one shuffle), deterministic
    first-200-buckets cap; the DuckDB twin is the relational
    self-join + median() formulation."""
    ev = _t(spark, sf_dir, "events")
    return diagnose.theil_sen(
        ev,
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600),
        F.col("value"),
        max_points=200,
    ).orderBy("event_type")


SQL_THEIL_SEN = """
WITH per AS (
  SELECT event_type AS k, floor(epoch(ts) / 3600)::BIGINT AS b,
         CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6))
           AS DOUBLE) AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), capped AS (
  SELECT k, b, v FROM (
    SELECT k, b, v,
           row_number() OVER (PARTITION BY k ORDER BY b) AS rn
    FROM per
  ) WHERE rn <= 200
), slopes AS (
  SELECT a.k AS k, (b2.v - a.v) / (b2.b - a.b)::DOUBLE AS s
  FROM capped a JOIN capped b2 ON a.k = b2.k AND b2.b > a.b
), np AS (
  SELECT k, count(*)::BIGINT AS n_points FROM capped GROUP BY k
)
SELECT np.k AS event_type, n_points, count(s)::BIGINT AS n_slopes,
       round(median(s), 6) AS slope
FROM slopes JOIN np ON slopes.k = np.k
GROUP BY np.k, n_points
ORDER BY event_type
"""


def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five power-iteration steps toward the behavioral chain's
    stationary distribution (analytics.markov_stationary): 64-bit
    fixed-point integer arithmetic end-to-end (the pagerank device) so
    the iterative result is bit-identical across engines; the twin
    unrolls the same five integer steps."""
    return analytics.markov_stationary(
        _t(spark, sf_dir, "events"), iters=5
    ).orderBy("event_type")


SQL_MARKOV_STATIONARY = """
WITH pr AS (
  SELECT event_type AS i,
         lead(event_type) OVER (PARTITION BY user_id
           ORDER BY ts, event_id) AS j
  FROM events
), cnt AS (
  SELECT i, j, count(*)::BIGINT AS n FROM pr WHERE j IS NOT NULL
  GROUP BY 1, 2
), p AS (
  SELECT i, j,
         (n * 1000000) // sum(n) OVER (PARTITION BY i) AS p_fp
  FROM cnt
), st AS (SELECT DISTINCT i AS s FROM p),
kk AS (SELECT count(*)::BIGINT AS k FROM st),
v0 AS (SELECT s, 1000000 // k AS pi_fp FROM st CROSS JOIN kk),
v1 AS (SELECT p.j AS s, sum(v0.pi_fp * p.p_fp) // 1000000 AS pi_fp
       FROM p JOIN v0 ON p.i = v0.s GROUP BY p.j),
v2 AS (SELECT p.j AS s, sum(v1.pi_fp * p.p_fp) // 1000000 AS pi_fp
       FROM p JOIN v1 ON p.i = v1.s GROUP BY p.j),
v3 AS (SELECT p.j AS s, sum(v2.pi_fp * p.p_fp) // 1000000 AS pi_fp
       FROM p JOIN v2 ON p.i = v2.s GROUP BY p.j),
v4 AS (SELECT p.j AS s, sum(v3.pi_fp * p.p_fp) // 1000000 AS pi_fp
       FROM p JOIN v3 ON p.i = v3.s GROUP BY p.j),
v5 AS (SELECT p.j AS s, sum(v4.pi_fp * p.p_fp) // 1000000 AS pi_fp
       FROM p JOIN v4 ON p.i = v4.s GROUP BY p.j)
SELECT s AS event_type, pi_fp::BIGINT AS pi_fp FROM v5
ORDER BY event_type
"""


def q_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state dwell times (analytics.dwell_time): exact microsecond
    forward gaps from one user-keyed window, bounded-state partial
    agg, exact-sum means."""
    return analytics.dwell_time(_t(spark, sf_dir, "events")).orderBy(
        "state"
    )


SQL_DWELL_TIME = """
WITH g AS (
  SELECT event_type AS state,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
           ORDER BY ts, event_id) - epoch_us(ts) AS dwell_us
  FROM events
)
SELECT state, count(*)::BIGINT AS n_visits,
       count(dwell_us)::BIGINT AS n_dwells,
       round(sum(dwell_us)::DOUBLE / 1e6, 6) AS total_dwell_s,
       round(sum(dwell_us)::DOUBLE / count(dwell_us)::DOUBLE / 1e6, 6)
         AS mean_dwell_s
FROM g GROUP BY state ORDER BY state
"""


def q_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Holt level+trend forecast (analytics.holt_linear):
    alpha = beta = 1/2 so every smoothing step is a pure exponent
    decrement plus identically-rounded IEEE adds — the DuckDB
    recursive-CTE twin reproduces every double bit-for-bit (the ewma
    device, extended to a two-component state)."""
    return analytics.holt_linear(_t(spark, sf_dir, "events")).orderBy(
        "user_id"
    )


SQL_HOLT_LINEAR = """
WITH RECURSIVE seq AS (
  SELECT user_id AS k,
         row_number() OVER (PARTITION BY user_id
           ORDER BY ts, event_id) AS i,
         value AS x
  FROM events WHERE value IS NOT NULL
), nn AS (SELECT k, max(i) AS n FROM seq GROUP BY k),
f AS (
  SELECT k, 1 AS i, x AS l, 0.0::DOUBLE AS b FROM seq WHERE i = 1
  UNION ALL
  SELECT f.k, f.i + 1,
         0.5 * s.x + 0.5 * (f.l + f.b),
         0.5 * ((0.5 * s.x + 0.5 * (f.l + f.b)) - f.l) + 0.5 * f.b
  FROM f JOIN seq s ON s.k = f.k AND s.i = f.i + 1
)
SELECT f.k AS user_id, nn.n::BIGINT AS n_obs, f.l AS level,
       f.b AS trend, f.l + f.b AS forecast
FROM f JOIN nn ON f.k = nn.k AND f.i = nn.n
ORDER BY user_id
"""




# Keys with at least one green driver CORRECTNESS row in rounds 1-5
# (union of CORRECTNESS_r01..r05 keys — a stable historical fact,
# embedded so the rotation needs no filesystem reads under
# spark-submit).  The r6 sample rotation moves every key NOT in this
# set to the head of the registry; see the ordering note in queries().
_DRIVER_CHECKED_R1_R5 = frozenset((
    "asof_join", "autocorrelation", "bloom_semi_join", "changepoint",
    "column_profile", "concurrency_peak", "contamination",
    "corpus_curation", "cuped_adjust", "data_quality",
    "dedup_canonical", "dedup_exact", "distinct_users",
    "distinctive_terms", "doc_assembly", "doc_assembly_display",
    "doc_assembly_salted", "doc_chunks", "doc_fingerprints",
    "dup_clusters", "embedding_dupes", "embedding_topk", "event_melt",
    "event_type_pivot", "events_cube", "events_hourly",
    "events_resample", "extract_html", "extract_images",
    "extract_markdown", "extract_spans", "extraction_report",
    "fence_strip", "footer_stats", "frame_sample", "full_outer_recon",
    "grouping_sets", "images_b64_decode", "inline_images_b64",
    "ivf_ann", "json_fields", "key_profile", "latest_events", "lsh_ann",
    "main_content", "minhash_incremental", "minhash_lsh",
    "multimodal_features", "ngram_pairs", "ocr_insert", "ocr_map",
    "orders_no_lineitems", "pack_sequences", "pareto_share",
    "pii_scrub", "placeholder_rewrite", "png_features", "q1_pricing",
    "q3_shipping_priority", "q5_local_supplier", "quality_scores",
    "quantize_embeddings", "quarantine", "range_join",
    "repetition_stats", "revenue_by_nation", "revenue_rollup",
    "running_user_value", "sanitize_stem", "sequence_gaps", "simhash",
    "sliding_window_avg", "span_boilerplate", "sssp_weighted",
    "stratified_sample", "stream_dedup", "stream_enrich",
    "stream_event_counts", "stream_event_counts_append",
    "stream_extract", "stream_near_dup", "stream_quarantine",
    "stream_sessionize", "stream_stream_join", "structured_ocr",
    "survival_curve", "tfidf_top_terms", "thumbnail", "token_stats",
    "top3_orders", "train_split", "translate_markdown",
    "translate_markdown_udf", "user_setops", "user_streaks",
    "value_ntile", "value_quantiles", "value_quantiles_approx",
    "variant_fields", "wav_features",
))


def _rotate_never_checked(reg):
    """Never-driver-checked keys first (relative order preserved),
    then the historically checked ones — so the driver's first-50
    sample covers fresh keys each round (VERDICT r5 #2).  One pinned
    exception: translate_markdown_udf (the production translation
    plug-point boundary) stays in the sample window every round per
    VERDICT r5 #5 — the Arrow-boundary contract should carry a fresh
    driver row each round, not only its r03/r04 history.  Key set and
    per-key content are unchanged; only the order moves."""
    pin = "translate_markdown_udf"
    head = {k: reg[k] for k in ([pin] if pin in reg else [])}
    head.update(
        {k: v for k, v in reg.items() if k not in _DRIVER_CHECKED_R1_R5}
    )
    head.update(
        {
            k: v
            for k, v in reg.items()
            if k in _DRIVER_CHECKED_R1_R5 and k != pin
        }
    )
    return head


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Registry ORDER is load-bearing: the driver's oracle gate samples
    # the first 50 keys.  ROUND-6 UPDATE: ordering is now mechanical —
    # _rotate_never_checked moves every key without a green driver row
    # in rounds 1-5 (140 of 240; the embedded _DRIVER_CHECKED_R1_R5
    # set) to the head, relative order preserved, so each round's
    # 50-key sample drains the never-checked pool (~3 rounds to full
    # coverage).  The hand-ordering notes below describe the r5 layout
    # the rotation now supersedes.  Session-8 update: the 26 session-8 additions
    # (sssp_weighted ... epoch_budget) are never driver-checked and sit
    # at the head of the round-5-additions block, so the r5 sample =
    # the r03-stale block + the first ~9 of them; every key not in the
    # sample is value-checked against its DuckDB twin locally on every
    # suite run (tests/test_entry_oracle.py — the same comparison the
    # driver makes).  Per the r4 verdict ask #6 the 37 keys whose
    # last green driver row is CORRECTNESS_r03 head the r5 sample,
    # interleaved with this round's late additions (bloom_semi_join,
    # footer_stats, column_profile — never driver-checked, so they
    # outrank the locally-verified r5 keys they displace); ~10 of the
    # other never-checked round-5 additions still fit in the 50; the
    # remaining 35 round-5 additions — every one locally value-checked
    # against its DuckDB twin in tests/test_entry_oracle.py each suite
    # run — rotate to the head of the r6 sample, then the 50
    # re-verified in r04.  The 17 session-3 additions (TPC-H
    # Q4/Q6/Q7/Q8/Q9/Q15/Q19/Q21, line_dedup, sorted_neighborhood,
    # ewma, k_core, classifier_score, corpus_drift, value_ohlc,
    # hard_negatives, winsorized_stats) and the 13 session-4 additions
    # (preference_pairs, item_cooccurrence, length_buckets,
    # contingency_chi2, corr_pairs, vocab_growth, mad_flags,
    # centroid_classify, bpe_train, bpe_encode, cms_counts,
    # attribution, agg_merge) sit AFTER the first-50 sample window (inserted
    # mid-registry after winsorized_stats, position ~65+) and join the
    # never-driver-checked pool that heads the r6 rotation, as do the
    # session-5 additions (window_funnel, text_normalize, k_anonymity,
    # plus the TPC-H-completion five: q2_min_cost_supplier,
    # q11_important_parts, q12_priority_lateness, q16_supplier_variety,
    # q20_excess_share — every TPC-H query shape Q1-Q22 expressible on
    # this corpus's columns is now registered).
    return _rotate_never_checked({
        # -- last driver row is round 3 (stale-first)
        "ocr_insert": q_ocr_insert,
        "fence_strip": q_fence_strip,
        "sanitize_stem": q_sanitize_stem,
        "q1_pricing": q_q1_pricing,
        "revenue_by_nation": q_revenue_by_nation,
        "q3_shipping_priority": q3_shipping_priority,
        "orders_no_lineitems": q_orders_no_lineitems,
        "top3_orders": q_top3_orders,
        "events_hourly": q_events_hourly,
        "running_user_value": q_running_user_value,
        "asof_join": q_asof_join,
        "bloom_semi_join": q_bloom_semi_join,
        "range_join": q_range_join,
        "token_stats": q_token_stats,
        "quality_scores": q_quality_scores,
        "span_boilerplate": q_span_boilerplate,
        "main_content": q_main_content,
        "doc_fingerprints": q_doc_fingerprints,
        "value_quantiles": q_value_quantiles,
        "value_quantiles_approx": q_value_quantiles_approx,
        "user_setops": q_user_setops,
        "revenue_rollup": q_revenue_rollup,
        "train_split": q_train_split,
        "tfidf_top_terms": q_tfidf_top_terms,
        "stratified_sample": q_stratified_sample,
        "distinct_users": q_distinct_users,
        "key_profile": q_key_profile,
        "footer_stats": q_footer_stats,
        "column_profile": q_column_profile,
        "sequence_gaps": q_sequence_gaps,
        "json_fields": q_json_fields,
        "q5_local_supplier": q_q5_local_supplier,
        "latest_events": q_latest_events,
        "stream_quarantine": q_stream_quarantine,
        "extraction_report": q_extraction_report,
        "wav_features": q_wav_features,
        "variant_fields": q_variant_fields,
        "dedup_exact": q_dedup_exact,
        "ngram_pairs": q_ngram_pairs,
        "embedding_topk": q_embedding_topk,
        "minhash_lsh": q_minhash_lsh,
        # -- round-5 additions (never driver-checked)
        "sssp_weighted": q_sssp_weighted,
        "concurrency_peak": q_concurrency_peak,
        "cuped_adjust": q_cuped_adjust,
        "pareto_share": q_pareto_share,
        "autocorrelation": q_autocorrelation,
        "changepoint": q_changepoint,
        "user_streaks": q_user_streaks,
        "survival_curve": q_survival_curve,
        "distinctive_terms": q_distinctive_terms,
        "source_divergence": q_source_divergence,
        "mutual_information": q_mutual_information,
        "hhi_concentration": q_hhi_concentration,
        "pmi_collocations": q_pmi_collocations,
        "benford_audit": q_benford_audit,
        "degree_stats": q_degree_stats,
        "conversion_latency": q_conversion_latency,
        "dau_mau": q_dau_mau,
        "gini_index": q_gini_index,
        "seasonality_profile": q_seasonality_profile,
        "path_trigrams": q_path_trigrams,
        "burstiness": q_burstiness,
        "audience_overlap": q_audience_overlap,
        "rolling_zscore": q_rolling_zscore,
        "stream_rolling_anomaly": q_stream_rolling_anomaly,
        "epoch_budget": q_epoch_budget,
        "weighted_median": q_weighted_median,
        "ngram_novelty": q_ngram_novelty,
        "csv_ingest": q_csv_ingest,
        "theil_sen": q_theil_sen,
        "markov_stationary": q_markov_stationary,
        "dwell_time": q_dwell_time,
        "holt_linear": q_holt_linear,
        "bitext_pairs": q_bitext_pairs,
        "retrieval_ndcg": q_retrieval_ndcg,
        "zorder_cluster": q_zorder_cluster,
        "agent_loops": q_agent_loops,
        "classifier_auc": q_classifier_auc,
        "ab_ttest": q_ab_ttest,
        "calibration_bins": q_calibration_bins,
        "stream_agent_loops": q_stream_agent_loops,
        "substring_dup": q_substring_dup,
        "prefix_jaccard": q_prefix_jaccard,
        "ivf_quantized": q_ivf_quantized,
        "ngram_lm_score": q_ngram_lm_score,
        "q13_custdist": q_q13_custdist,
        "q14_promo_effect": q_q14_promo_effect,
        "q17_small_qty_revenue": q_q17_small_qty_revenue,
        "q18_large_orders": q_q18_large_orders,
        "q22_idle_customers": q_q22_idle_customers,
        "q4_order_priority": q_q4_order_priority,
        "q6_forecast_revenue": q_q6_forecast_revenue,
        "q7_volume_shipping": q_q7_volume_shipping,
        "q8_market_share": q_q8_market_share,
        "q9_product_profit": q_q9_product_profit,
        "q15_top_supplier": q_q15_top_supplier,
        "q19_disjunctive": q_q19_disjunctive,
        "q21_blame_supplier": q_q21_blame_supplier,
        "q2_min_cost_supplier": q_q2_min_cost_supplier,
        "q11_important_parts": q_q11_important_parts,
        "q12_priority_lateness": q_q12_priority_lateness,
        "q16_supplier_variety": q_q16_supplier_variety,
        "q20_excess_share": q_q20_excess_share,
        "line_dedup": q_line_dedup,
        "sorted_neighborhood": q_sorted_neighborhood,
        "ewma": q_ewma,
        "k_core": q_k_core,
        "classifier_score": q_classifier_score,
        "corpus_drift": q_corpus_drift,
        "value_ohlc": q_value_ohlc,
        "hard_negatives": q_hard_negatives,
        "winsorized_stats": q_winsorized_stats,
        "preference_pairs": q_preference_pairs,
        "item_cooccurrence": q_item_cooccurrence,
        "length_buckets": q_length_buckets,
        "contingency_chi2": q_contingency_chi2,
        "corr_pairs": q_corr_pairs,
        "vocab_growth": q_vocab_growth,
        "mad_flags": q_mad_flags,
        "centroid_classify": q_centroid_classify,
        "bpe_train": q_bpe_train,
        "bpe_encode": q_bpe_encode,
        "cms_counts": q_cms_counts,
        "attribution": q_attribution,
        "agg_merge": q_agg_merge,
        "stream_agg_merge": q_stream_agg_merge,
        "join_cardinality": q_join_cardinality,
        "pareto_frontier": q_pareto_frontier,
        "bfs_distance": q_bfs_distance,
        "twap": q_twap,
        "window_funnel": q_window_funnel,
        "text_normalize": q_text_normalize,
        "k_anonymity": q_k_anonymity,
        "grouped_sample": q_grouped_sample,
        "leakage_safe_split": q_leakage_safe_split,
        "url_host_stats": q_url_host_stats,
        "incremental_clusters": q_incremental_clusters,
        "stream_dup_clusters": q_stream_dup_clusters,
        "semantic_dedup": q_semantic_dedup,
        "value_trend": q_value_trend,
        "communities": q_communities,
        "posting_lists": q_posting_lists,
        "stream_trending": q_stream_trending,
        "dsir_weights": q_dsir_weights,
        "apply_changeset": q_apply_changeset,
        "context_trim": q_context_trim,
        "uniform_sample": q_uniform_sample,
        "weighted_sample": q_weighted_sample,
        "substring_search": q_substring_search,
        "fuzzy_pairs": q_fuzzy_pairs,
        "ngram_diversity": q_ngram_diversity,
        "token_budget_sample": q_token_budget_sample,
        "transition_matrix": q_transition_matrix,
        "anomaly_flags": q_anomaly_flags,
        "event_funnel": q_event_funnel,
        "cohort_retention": q_cohort_retention,
        "pagerank": q_pagerank,
        "bm25_topk": q_bm25,
        "rrf_fusion": q_rrf_fusion,
        "source_overlap": q_source_overlap,
        "embedding_drift": q_embedding_drift,
        "triangle_counts": q_triangle_counts,
        "stream_funnel": q_stream_funnel,
        "heavy_hitters": q_heavy_hitters,
        "value_histogram": q_value_histogram,
        "q10_returned_items": q_q10_returned_items,
        "asof_join_forward": q_asof_join_forward,
        "token_entropy": q_token_entropy,
        "rfm_segments": q_rfm_segments,
        "scd2_intervals": q_scd2_intervals,
        "interval_overlap": q_interval_overlap,
        "vocab_coverage": q_vocab_coverage,
        "ann_recall": q_ann_recall,
        "transcript_curation": q_transcript_curation,
        "bpe_merges": q_bpe_merges,
        "table_cells": q_table_cells,
        "ivf_incremental": q_ivf_incremental,
        "stream_sft_examples": q_stream_sft_examples,
        "conv_stats": q_conv_stats,
        "role_violations": q_role_violations,
        "chat_render": q_chat_render,
        "sft_examples": q_sft_examples,
        "sessionize": q_sessionize,
        "session_window": q_session_window,
        "tool_usage": q_tool_usage,
        "stream_turn_dedup": q_stream_turn_dedup,
        "turn_dedup": q_turn_dedup,
        "shard_shuffle": q_shard_shuffle,
        "mixture_sample": q_mixture_sample,
        # -- green in CORRECTNESS_r04 (rotate forward when stale)
        "dup_clusters": q_dup_clusters,
        "dedup_canonical": q_dedup_canonical,
        "minhash_incremental": q_minhash_incremental,
        "events_cube": q_events_cube,
        "quarantine": q_quarantine,
        "png_features": q_png_features,
        "image_dedup": q_image_dedup,
        "event_type_pivot": q_event_type_pivot,
        "stream_event_counts_append": q_stream_event_counts_append,
        "stream_stream_join": q_stream_stream_join,
        "pii_scrub": q_pii_scrub,
        "repetition_stats": q_repetition_stats,
        "doc_chunks": q_doc_chunks,
        "pack_sequences": q_pack_sequences,
        "contamination": q_contamination,
        "stream_near_dup": q_stream_near_dup,
        "corpus_curation": q_corpus_curation,
        "event_melt": q_event_melt,
        "grouping_sets": q_grouping_sets,
        "sliding_window_avg": q_sliding_window_avg,
        "data_quality": q_data_quality,
        "stream_enrich": q_stream_enrich,
        "quantize_embeddings": q_quantize_embeddings,
        "full_outer_recon": q_full_outer_recon,
        "value_ntile": q_value_ntile,
        "events_resample": q_events_resample,
        "simhash": q_simhash,
        "lsh_ann": q_lsh_ann,
        "ivf_ann": q_ivf_ann,
        "embedding_dupes": q_embedding_dupes,
        "multimodal_features": q_multimodal_features,
        "frame_sample": q_frame_sample,
        "thumbnail": q_thumbnail,
        "stream_event_counts": q_stream_event_counts,
        "stream_dedup": q_stream_dedup,
        "stream_extract": q_stream_extract,
        "stream_sessionize": q_stream_sessionize,
        "extract_markdown": q_extract_markdown,
        "extract_html": q_extract_html,
        "extract_images": q_extract_images,
        "extract_spans": q_extract_spans,
        "images_b64_decode": q_images_b64_decode,
        "inline_images_b64": q_inline_images_b64,
        "structured_ocr": q_structured_ocr,
        "doc_assembly": q_doc_assembly,
        "doc_assembly_salted": q_doc_assembly_salted,
        "doc_assembly_display": q_doc_assembly_display,
        "translate_markdown": q_translate_markdown,
        "translate_markdown_udf": q_translate_markdown_udf,
        "ocr_map": q_ocr_map,
        "placeholder_rewrite": q_placeholder_rewrite,
    })



def oracle_sql() -> dict[str, str]:
    # Same order as queries() — keep the two registries aligned.
    # (value_quantiles_approx has no oracle entry by design: the sketch
    # twin is pinned by tests/test_sampling.py error bounds instead.)
    return _rotate_never_checked({
        # -- last driver row is round 3 (stale-first)
        "ocr_insert": SQL_OCR_INSERT,
        "fence_strip": SQL_FENCE_STRIP,
        "sanitize_stem": SQL_SANITIZE_STEM,
        "q1_pricing": SQL_Q1_PRICING,
        "revenue_by_nation": SQL_REVENUE_BY_NATION,
        "q3_shipping_priority": SQL_Q3_SHIPPING_PRIORITY,
        "orders_no_lineitems": SQL_ORDERS_NO_LINEITEMS,
        "top3_orders": SQL_TOP3_ORDERS,
        "events_hourly": SQL_EVENTS_HOURLY,
        "running_user_value": SQL_RUNNING_USER_VALUE,
        "asof_join": SQL_ASOF_JOIN,
        "bloom_semi_join": SQL_BLOOM_SEMI_JOIN,
        "range_join": SQL_RANGE_JOIN,
        "token_stats": SQL_TOKEN_STATS,
        "quality_scores": SQL_QUALITY_SCORES,
        "span_boilerplate": SQL_SPAN_BOILERPLATE,
        "main_content": SQL_MAIN_CONTENT,
        "doc_fingerprints": SQL_DOC_FINGERPRINTS,
        "value_quantiles": SQL_VALUE_QUANTILES,
        "user_setops": SQL_USER_SETOPS,
        "revenue_rollup": SQL_REVENUE_ROLLUP,
        "train_split": SQL_TRAIN_SPLIT,
        "tfidf_top_terms": SQL_TFIDF_TOP_TERMS,
        "stratified_sample": SQL_STRATIFIED_SAMPLE,
        "distinct_users": SQL_DISTINCT_USERS,
        "key_profile": SQL_KEY_PROFILE,
        "footer_stats": SQL_FOOTER_STATS,
        "column_profile": SQL_COLUMN_PROFILE,
        "sequence_gaps": SQL_SEQUENCE_GAPS,
        "json_fields": SQL_JSON_FIELDS,
        "q5_local_supplier": SQL_Q5_LOCAL_SUPPLIER,
        "latest_events": SQL_LATEST_EVENTS,
        "stream_quarantine": SQL_QUARANTINE,
        "extraction_report": SQL_EXTRACTION_REPORT,
        "wav_features": SQL_WAV_FEATURES,
        "variant_fields": SQL_JSON_FIELDS,
        "dedup_exact": SQL_DEDUP_EXACT,
        "ngram_pairs": SQL_NGRAM_PAIRS,
        "embedding_topk": SQL_EMBEDDING_TOPK,
        "minhash_lsh": SQL_MINHASH_LSH,
        # -- round-5 additions (never driver-checked)
        "bitext_pairs": SQL_BITEXT_PAIRS,
        "retrieval_ndcg": SQL_RETRIEVAL_NDCG,
        "zorder_cluster": SQL_ZORDER_CLUSTER,
        "agent_loops": SQL_AGENT_LOOPS,
        "classifier_auc": SQL_CLASSIFIER_AUC,
        "ab_ttest": SQL_AB_TTEST,
        "calibration_bins": SQL_CALIBRATION_BINS,
        "stream_agent_loops": SQL_AGENT_LOOPS,
        "substring_dup": SQL_SUBSTRING_DUP,
        "prefix_jaccard": SQL_PREFIX_JACCARD,
        "ivf_quantized": SQL_IVF_QUANTIZED,
        "ngram_lm_score": SQL_NGRAM_LM_SCORE,
        "q13_custdist": SQL_Q13_CUSTDIST,
        "q14_promo_effect": SQL_Q14_PROMO_EFFECT,
        "q17_small_qty_revenue": SQL_Q17_SMALL_QTY,
        "q18_large_orders": SQL_Q18_LARGE_ORDERS,
        "q22_idle_customers": SQL_Q22_IDLE_CUSTOMERS,
        "q4_order_priority": SQL_Q4_ORDER_PRIORITY,
        "q6_forecast_revenue": SQL_Q6_FORECAST_REVENUE,
        "q7_volume_shipping": SQL_Q7_VOLUME_SHIPPING,
        "q8_market_share": SQL_Q8_MARKET_SHARE,
        "q9_product_profit": SQL_Q9_PRODUCT_PROFIT,
        "q15_top_supplier": SQL_Q15_TOP_SUPPLIER,
        "q19_disjunctive": SQL_Q19_DISJUNCTIVE,
        "q21_blame_supplier": SQL_Q21_BLAME_SUPPLIER,
        "q2_min_cost_supplier": SQL_Q2_MIN_COST_SUPPLIER,
        "q11_important_parts": SQL_Q11_IMPORTANT_PARTS,
        "q12_priority_lateness": SQL_Q12_PRIORITY_LATENESS,
        "q16_supplier_variety": SQL_Q16_SUPPLIER_VARIETY,
        "q20_excess_share": SQL_Q20_EXCESS_SHARE,
        "line_dedup": SQL_LINE_DEDUP,
        "sorted_neighborhood": SQL_SORTED_NEIGHBORHOOD,
        "ewma": SQL_EWMA,
        "k_core": SQL_K_CORE,
        "classifier_score": SQL_CLASSIFIER_SCORE,
        "corpus_drift": SQL_CORPUS_DRIFT,
        "value_ohlc": SQL_VALUE_OHLC,
        "hard_negatives": SQL_HARD_NEGATIVES,
        "winsorized_stats": SQL_WINSORIZED_STATS,
        "preference_pairs": SQL_PREFERENCE_PAIRS,
        "item_cooccurrence": SQL_ITEM_COOCCURRENCE,
        "length_buckets": SQL_LENGTH_BUCKETS,
        "contingency_chi2": SQL_CONTINGENCY_CHI2,
        "corr_pairs": SQL_CORR_PAIRS,
        "vocab_growth": SQL_VOCAB_GROWTH,
        "mad_flags": SQL_MAD_FLAGS,
        "centroid_classify": SQL_CENTROID_CLASSIFY,
        "bpe_train": SQL_BPE_TRAIN,
        "bpe_encode": SQL_BPE_ENCODE,
        "cms_counts": SQL_CMS_COUNTS,
        "attribution": SQL_ATTRIBUTION,
        "agg_merge": SQL_AGG_MERGE,
        "stream_agg_merge": SQL_AGG_MERGE,
        "join_cardinality": SQL_JOIN_CARDINALITY,
        "pareto_frontier": SQL_PARETO_FRONTIER,
        "bfs_distance": SQL_BFS_DISTANCE,
        "sssp_weighted": SQL_SSSP_WEIGHTED,
        "concurrency_peak": SQL_CONCURRENCY_PEAK,
        "cuped_adjust": SQL_CUPED_ADJUST,
        "pareto_share": SQL_PARETO_SHARE,
        "autocorrelation": SQL_AUTOCORRELATION,
        "changepoint": SQL_CHANGEPOINT,
        "user_streaks": SQL_USER_STREAKS,
        "survival_curve": SQL_SURVIVAL_CURVE,
        "distinctive_terms": SQL_DISTINCTIVE_TERMS,
        "source_divergence": SQL_SOURCE_DIVERGENCE,
        "mutual_information": SQL_MUTUAL_INFORMATION,
        "hhi_concentration": SQL_HHI_CONCENTRATION,
        "pmi_collocations": SQL_PMI_COLLOCATIONS,
        "benford_audit": SQL_BENFORD_AUDIT,
        "degree_stats": SQL_DEGREE_STATS,
        "conversion_latency": SQL_CONVERSION_LATENCY,
        "dau_mau": SQL_DAU_MAU,
        "gini_index": SQL_GINI_INDEX,
        "seasonality_profile": SQL_SEASONALITY_PROFILE,
        "path_trigrams": SQL_PATH_TRIGRAMS,
        "burstiness": SQL_BURSTINESS,
        "audience_overlap": SQL_AUDIENCE_OVERLAP,
        "rolling_zscore": SQL_ROLLING_ZSCORE,
        "stream_rolling_anomaly": SQL_ROLLING_ZSCORE,
        "epoch_budget": SQL_EPOCH_BUDGET,
        "weighted_median": SQL_WEIGHTED_MEDIAN,
        "ngram_novelty": SQL_NGRAM_NOVELTY,
        "csv_ingest": SQL_CSV_INGEST,
        "theil_sen": SQL_THEIL_SEN,
        "markov_stationary": SQL_MARKOV_STATIONARY,
        "dwell_time": SQL_DWELL_TIME,
        "holt_linear": SQL_HOLT_LINEAR,
        "twap": SQL_TWAP,
        "window_funnel": SQL_WINDOW_FUNNEL,
        "text_normalize": SQL_TEXT_NORMALIZE,
        "k_anonymity": SQL_K_ANONYMITY,
        "grouped_sample": SQL_GROUPED_SAMPLE,
        "leakage_safe_split": SQL_LEAKAGE_SPLIT,
        "url_host_stats": SQL_URL_HOST_STATS,
        # shares the from-scratch closure: the match IS the invariance
        "incremental_clusters": SQL_DUP_CLUSTERS,
        "stream_dup_clusters": SQL_DUP_CLUSTERS,
        "semantic_dedup": SQL_SEMANTIC_DEDUP,
        "value_trend": SQL_VALUE_TREND,
        "communities": SQL_COMMUNITIES,
        "posting_lists": SQL_POSTING_LISTS,
        "stream_trending": SQL_STREAM_TRENDING,
        "dsir_weights": SQL_DSIR_WEIGHTS,
        "apply_changeset": SQL_APPLY_CHANGESET,
        "context_trim": SQL_CONTEXT_TRIM,
        "uniform_sample": SQL_UNIFORM_SAMPLE,
        "weighted_sample": SQL_WEIGHTED_SAMPLE,
        "substring_search": SQL_SUBSTRING_SEARCH,
        "fuzzy_pairs": SQL_FUZZY_PAIRS,
        "ngram_diversity": SQL_NGRAM_DIVERSITY,
        "token_budget_sample": SQL_TOKEN_BUDGET_SAMPLE,
        "transition_matrix": SQL_TRANSITION_MATRIX,
        "anomaly_flags": SQL_ANOMALY_FLAGS,
        "event_funnel": SQL_EVENT_FUNNEL,
        "cohort_retention": SQL_COHORT_RETENTION,
        "pagerank": SQL_PAGERANK,
        "bm25_topk": SQL_BM25,
        "rrf_fusion": SQL_RRF_FUSION,
        "source_overlap": SQL_SOURCE_OVERLAP,
        "embedding_drift": SQL_EMBEDDING_DRIFT,
        "triangle_counts": SQL_TRIANGLE_COUNTS,
        "stream_funnel": SQL_EVENT_FUNNEL,  # shared: stream == batch exactly
        "heavy_hitters": SQL_HEAVY_HITTERS,
        "value_histogram": SQL_VALUE_HISTOGRAM,
        "q10_returned_items": SQL_Q10_RETURNED_ITEMS,
        "asof_join_forward": SQL_ASOF_JOIN_FORWARD,
        "token_entropy": SQL_TOKEN_ENTROPY,
        "rfm_segments": SQL_RFM_SEGMENTS,
        "scd2_intervals": SQL_SCD2_INTERVALS,
        "interval_overlap": SQL_INTERVAL_OVERLAP,
        "vocab_coverage": SQL_VOCAB_COVERAGE,
        "ann_recall": SQL_ANN_RECALL,
        "transcript_curation": SQL_TRANSCRIPT_CURATION,
        "bpe_merges": SQL_BPE_MERGES,
        "table_cells": SQL_TABLE_CELLS,
        "ivf_incremental": SQL_IVF_INCREMENTAL,
        "stream_sft_examples": SQL_STREAM_SFT_EXAMPLES,
        "conv_stats": SQL_CONV_STATS,
        "role_violations": SQL_ROLE_VIOLATIONS,
        "chat_render": SQL_CHAT_RENDER,
        "sft_examples": SQL_SFT_EXAMPLES,
        "sessionize": SQL_SESSIONIZE,
        "session_window": SQL_SESSION_WINDOW,
        "tool_usage": SQL_TOOL_USAGE,
        "turn_dedup": SQL_TURN_DEDUP,
        "stream_turn_dedup": SQL_STREAM_TURN_DEDUP,
        "shard_shuffle": SQL_SHARD_SHUFFLE,
        "mixture_sample": SQL_MIXTURE_SAMPLE,
        # -- green in CORRECTNESS_r04 (rotate forward when stale)
        "dup_clusters": SQL_DUP_CLUSTERS,
        "dedup_canonical": SQL_DEDUP_CANONICAL,
        "minhash_incremental": SQL_MINHASH_INCREMENTAL,
        "events_cube": SQL_EVENTS_CUBE,
        "quarantine": SQL_QUARANTINE,
        "png_features": SQL_PNG_FEATURES,
        "image_dedup": SQL_IMAGE_DEDUP,
        "event_type_pivot": SQL_EVENT_TYPE_PIVOT,
        "stream_event_counts_append": SQL_STREAM_EVENT_COUNTS_APPEND,
        "stream_stream_join": SQL_STREAM_STREAM_JOIN,
        "pii_scrub": SQL_PII_SCRUB,
        "repetition_stats": SQL_REPETITION_STATS,
        "doc_chunks": SQL_DOC_CHUNKS,
        "pack_sequences": SQL_PACK_SEQUENCES,
        "contamination": SQL_CONTAMINATION,
        "stream_near_dup": SQL_MINHASH_INCREMENTAL,
        "corpus_curation": SQL_CORPUS_CURATION,
        "event_melt": SQL_EVENT_MELT,
        "grouping_sets": SQL_GROUPING_SETS,
        "sliding_window_avg": SQL_SLIDING_WINDOW_AVG,
        "data_quality": SQL_DATA_QUALITY,
        "stream_enrich": SQL_STREAM_ENRICH,
        "quantize_embeddings": SQL_QUANTIZE_EMBEDDINGS,
        "full_outer_recon": SQL_FULL_OUTER_RECON,
        "value_ntile": SQL_VALUE_NTILE,
        "events_resample": SQL_EVENTS_RESAMPLE,
        "simhash": SQL_SIMHASH,
        "lsh_ann": SQL_LSH_ANN,
        "ivf_ann": SQL_IVF_ANN,
        "embedding_dupes": SQL_EMBEDDING_DUPES,
        "multimodal_features": SQL_MULTIMODAL_FEATURES,
        "frame_sample": SQL_FRAME_SAMPLE,
        "thumbnail": SQL_THUMBNAIL,
        "stream_event_counts": SQL_STREAM_EVENT_COUNTS,
        "stream_dedup": SQL_STREAM_DEDUP,
        "stream_extract": SQL_EXTRACT_MARKDOWN,
        "stream_sessionize": SQL_STREAM_SESSIONIZE,
        "extract_markdown": SQL_EXTRACT_MARKDOWN,
        "extract_html": SQL_EXTRACT_HTML,
        "extract_images": SQL_EXTRACT_IMAGES,
        "extract_spans": SQL_EXTRACT_SPANS,
        "images_b64_decode": SQL_IMAGES_B64_DECODE,
        "inline_images_b64": SQL_INLINE_IMAGES_B64,
        "structured_ocr": SQL_STRUCTURED_OCR,
        "doc_assembly": SQL_DOC_ASSEMBLY,
        "doc_assembly_salted": SQL_DOC_ASSEMBLY,
        "doc_assembly_display": SQL_DOC_ASSEMBLY_DISPLAY,
        "translate_markdown": SQL_TRANSLATE_MARKDOWN,
        "translate_markdown_udf": SQL_TRANSLATE_MARKDOWN_UDF,
        "ocr_map": SQL_OCR_MAP,
        "placeholder_rewrite": SQL_PLACEHOLDER_REWRITE,
    })

