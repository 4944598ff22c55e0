"""Text-analysis operators for training-data pipelines — all pure
Catalyst column expressions (JVM-side, whole-stage codegen; no Python).

Each has an exact ANSI-SQL twin in ``__spark_entry__.oracle_sql`` so the
driver's DuckDB cross-check validates values, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")

# Explicit ASCII whitespace class, identical under Java regex (Spark)
# and RE2 (the DuckDB oracle): Java's \s includes U+000B (vertical tab),
# RE2's does not, so a '\s+' tokenizer twin silently diverges on any doc
# containing VT.  Both engines read the \xhh escape, so this one string
# serves Spark split()/regexp_replace() and the oracle SQL verbatim.
# Parity is pinned on a VT fixture in tests/test_ws_parity.py.
WS = r"[ \t\n\x0b\f\r]+"

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
# (negated-whitespace spelled explicitly for the same VT reason)
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0b\f\r]"
CJK_RE = r"[一-鿿]"


def ws_token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank → 0."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, WS))
    )


def bpe_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_RE), 0))


def alpha_ratio(text: Column) -> Column:
    # regexp_count counts matches without materialising a stripped copy
    # of the string per row (length(regexp_replace(...)) allocated one —
    # measured as the round-1 bench outlier)
    n = F.length(text)
    a = F.regexp_count(text, F.lit("[A-Za-z]"))
    return F.when(n == 0, F.lit(0.0)).otherwise(F.round(a / n, 4))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    p = F.regexp_count(text, F.lit(r"[.,;:!?'\"()\[\]{}-]"))
    return F.when(n == 0, F.lit(0.0)).otherwise(F.round(p / n, 4))


def stopword_ratio(text: Column) -> Column:
    toks = F.split(F.trim(F.lower(text)), WS)
    n = ws_token_count(text)
    stops = F.size(
        F.filter(toks, lambda w: w.isin(*STOPWORDS))
    )
    return F.when(n == 0, F.lit(0.0)).otherwise(F.round(stops / n, 4))


def lang_id(text: Column) -> Column:
    """n-gram/character heuristic language ID (deterministic)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return (
        F.when(text.rlike(CJK_RE), F.lit("zh"))
        .when(
            padded.contains(" the ") | padded.contains(" and ")
            | padded.contains(" is "),
            F.lit("en"),
        )
        .when(
            padded.contains(" el ") | padded.contains(" la ")
            | padded.contains(" de "),
            F.lit("es"),
        )
        .otherwise(F.lit("other"))
    )


def fingerprint(text: Column) -> Column:
    """Whitespace-normalised lowercase md5 — document fingerprint."""
    return F.md5(F.lower(F.regexp_replace(text, WS, " ")))


# markdown link/image-link text: [text](target)
LINK_TEXT_RE = r"\[([^\]]*)\]\([^)]*\)"

# block-level boilerplate thresholds (readability/trafilatura-style)
BOILER_LINK_DENSITY = 0.5
BOILER_MIN_CHARS = 15


def link_density(text: Column) -> Column:
    """Share of a block's characters that live inside markdown link
    constructs (the whole ``[text](target)`` span) — the classic
    boilerplate signal: nav bars and link farms are mostly links, body
    prose is not."""
    links = F.regexp_extract_all(text, F.lit(LINK_TEXT_RE), 0)
    link_chars = F.aggregate(
        F.transform(links, F.length), F.lit(0), lambda a, b: a + b
    )
    n = F.length(text)
    return F.when(n == 0, F.lit(0.0)).otherwise(F.round(link_chars / n, 4))


def classify_spans(spans: DataFrame) -> DataFrame:
    """Block-level main-content vs boilerplate classification over the
    span table — pure Catalyst exprs, zero shuffle: a block is
    boilerplate when it is link-dominated (link_density ≥ 0.5) or too
    short to carry content (< 15 chars).  Composes with the extraction
    DAG: extract_spans → classify → filter for the main-content corpus."""
    ld = link_density(F.col("text"))
    is_bp = (ld >= BOILER_LINK_DENSITY) | (
        F.length("text") < BOILER_MIN_CHARS
    )
    return spans.select(
        "conv_id",
        "turn_idx",
        "block_idx",
        "block_type",
        F.length("text").alias("n_chars"),
        ld.alias("link_density"),
        is_bp.alias("is_boilerplate"),
    )


def main_content(spans: DataFrame) -> DataFrame:
    """End-to-end main-content extraction: drop boilerplate blocks and
    reassemble the surviving blocks into clean per-turn markdown
    (ordered by block_idx, joined with blank lines).  One grouped
    aggregation — the same ordered-concat shape as document assembly."""
    ld = link_density(F.col("text"))
    is_bp = (ld >= BOILER_LINK_DENSITY) | (F.length("text") < BOILER_MIN_CHARS)
    keep = spans.filter(~is_bp)
    pairs = F.collect_list(F.struct("block_idx", "text"))
    joined = F.array_join(
        F.transform(F.array_sort(pairs), lambda s: s["text"]), "\n\n"
    )
    return keep.groupBy("conv_id", "turn_idx").agg(
        joined.alias("main_markdown"),
        F.count("*").alias("n_blocks_kept"),
    )


ROLL_BASE = 1000003
ROLL_MOD = 2147483647  # 2^31-1: keeps h*BASE + tok inside long range


def rolling_fingerprint(text: Column) -> Column:
    """Rabin–Karp rolling polynomial fingerprint over whitespace tokens:

        h = fold(tokens, 0, (h, tok) → (h·BASE + hash(tok)) mod MOD)

    Order-sensitive (unlike a bag-of-tokens hash) and incremental — the
    shape used for shingle fingerprints and content-defined chunking.
    JVM-side fold (F.aggregate); the token hash is the portable
    md5-prefix integer, so DuckDB re-derives the identical value with
    list_reduce and the rolling arithmetic itself sits under the
    cross-engine oracle."""
    norm = F.trim(F.lower(F.regexp_replace(text, WS, " ")))
    toks = F.split(norm, " ")
    mod = F.lit(ROLL_MOD)

    def tok_hash(w: Column) -> Column:
        return F.pmod(
            F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long"), mod
        )

    h = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: F.pmod(acc * ROLL_BASE + tok_hash(w), mod),
    )
    return F.when(F.length(norm) == 0, F.lit(0).cast("long")).otherwise(h)


def quality_frame(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        ws_token_count(t).alias("n_tokens"),
        bpe_token_count(t).alias("n_bpe_tokens"),
        alpha_ratio(t).alias("alpha_ratio"),
        punct_ratio(t).alias("punct_ratio"),
        stopword_ratio(t).alias("stopword_ratio"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )


def deterministic_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Deterministic train/val/test assignment from a portable hash of
    the document id — the standard reshuffle-free split for training
    corpora: no RNG state, no sampling pass, stable under reruns,
    cluster-size changes AND engine changes (the md5-prefix hash is
    reproducible in DuckDB, so the assignment itself is oracle-checked).
    A pure projection: zero shuffle at any scale."""
    from engine.spark.dedup import portable_hash60

    bucket = F.pmod(portable_hash60(F.col(id_col).cast("string")), F.lit(100))
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.withColumn("split", split)


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "strat",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling (e.g. downsample dominant
    languages / sources when mixing a training corpus): a row survives
    iff portable_hash(salt:id) mod 1e6 falls under its stratum's
    fraction.  No RNG, no sampling pass, stable under reruns and
    cluster-size changes, and reproducible in DuckDB (oracle-checked).
    A pure filter projection — zero shuffle at any scale; changing
    ``salt`` draws an independent sample."""
    from engine.spark.dedup import portable_hash60

    u = F.pmod(
        portable_hash60(
            F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
        ),
        F.lit(1000000),
    )
    keep = F.lit(False)
    for stratum, frac in sorted(fractions.items()):
        keep = keep | (
            (F.col(strata_col) == stratum) & (u < int(frac * 1000000))
        )
    if default_fraction > 0:
        known = F.col(strata_col).isin(*fractions.keys())
        keep = keep | (~known & (u < int(default_fraction * 1000000)))
    return docs.where(keep)


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    max_df_ratio: float = 0.5,
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf
    (idf = ln(N/df)), all JVM-side: split → explode → two hash
    aggregations → term-key join → per-doc top-k window.

    Scale notes: the doc-frequency table is aggregated with map-side
    combine before the join; terms appearing in more than
    ``max_df_ratio`` of documents (stopwords — exactly the hot keys that
    would skew the term join) are dropped *before* the join, the same
    df-cap pattern as ``dedup.ngram_jaccard_pairs``.  The final top-k is
    a bounded window per doc_id, never a global sort.  The corpus size N
    rides as a broadcast single-row aggregate (scan-only count branch,
    no shuffle), not a driver ``.count()``, so plan construction stays
    lazy and the whole query is ONE timed/schedulable job."""
    from pyspark.sql import Window

    n_docs_df = docs.agg(F.count("*").alias("_n_docs"))
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), WS)).alias(
            "term"
        ),
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(n_docs_df))
        # floor() matches the former int(max_df_ratio * n_docs)
        .where(F.col("df") <= F.floor(F.lit(max_df_ratio) * F.col("_n_docs")))
    )
    scored = tf.join(df, "term").select(
        "doc_id",
        "term",
        "tf",
        F.round(
            F.col("tf")
            * F.log(F.col("_n_docs").cast("double") / F.col("df")),
            6,
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "tfidf", "rank")
    )


# ----------------------------------------------------------- PII scrub
# Redaction patterns shared VERBATIM with the DuckDB oracle: every
# construct here ( \b, {m,n}, character classes ) means the same thing
# in Java regex and RE2, so the two engines cannot drift.  Deliberately
# conservative (no lookaround — RE2 has none) and anchored on digits/@
# so the false-positive surface on prose is small.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+?[0-9][0-9() -]{6,}[0-9]"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-data PII redaction: emails, IPv4 addresses and
    phone-like digit runs replaced with typed placeholder tokens, with
    per-document redaction counts for pipeline monitoring.

    Order matters and is part of the contract: emails first (their
    local/domain parts may contain digits a later pass would chew),
    then IPs (dotted quads — the phone class has no '.' so the reverse
    order would also work, but the fixed order keeps the oracle exact),
    then phones over the already-redacted text.

    Scale shape: a zero-shuffle projection — three regexp_count + three
    regexp_replace, all inside whole-stage codegen; at 100 TB this is a
    pure map over the scan with no Python anywhere."""
    t = F.col(text_col)
    after_email = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_IPV4, "<IP>")
    clean = F.regexp_replace(after_ip, PII_PHONE, "<PHONE>")
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        F.regexp_count(t, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(after_email, F.lit(PII_IPV4))
        .cast("long")
        .alias("n_ips"),
        F.regexp_count(after_ip, F.lit(PII_PHONE))
        .cast("long")
        .alias("n_phones"),
    )


# Text-normalization patterns: Java-regex ∩ RE2 only.  Code points above
# 0xFF use \x{...} (both engines); control chars use \xhh ranges so the
# pattern string itself stays ASCII (safe to embed in oracle SQL text).
# No backreferences anywhere — RE2 has none, so repeated-punctuation
# runs are per-character classes, not a (.)\1 generic.
NORM_CR = r"\r\n?"
NORM_NBSP = r"\x{00A0}"
NORM_ZERO_WIDTH = r"[\x{200B}\x{200C}\x{200D}\x{FEFF}]"
NORM_CTRL = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
NORM_DOT_RUN = r"\.{4,}"
NORM_BANG_RUN = r"!{4,}"
NORM_QMARK_RUN = r"\?{4,}"


def text_normalize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Encoding-artifact cleanup for web/OCR corpora (the ftfy-lite
    pass every training pipeline runs before tokenization): CRLF and
    stray CR → LF, NBSP → plain space, zero-width characters (ZWSP/
    ZWNJ/ZWJ/BOM) removed, non-whitespace control characters removed,
    and runs of ≥4 identical sentence punctuation collapsed to exactly
    three.  Order is part of the contract (counts are measured on the
    ORIGINAL text; punctuation collapse sees the already-cleaned
    text).

    Returns (doc_id, norm_text, n_zero_width, n_ctrl, changed).

    Scale shape: a zero-shuffle projection — seven regexp_replace +
    two regexp_count, all inside whole-stage codegen; at 100 TB this
    is a pure map over the scan with no Python anywhere.  Patterns are
    shared verbatim with the DuckDB oracle (Java ∩ RE2 subset, no
    backreferences)."""
    t = F.col(text_col)
    s = F.regexp_replace(t, NORM_CR, "\n")
    s = F.regexp_replace(s, NORM_NBSP, " ")
    s = F.regexp_replace(s, NORM_ZERO_WIDTH, "")
    s = F.regexp_replace(s, NORM_CTRL, "")
    s = F.regexp_replace(s, NORM_DOT_RUN, "...")
    s = F.regexp_replace(s, NORM_BANG_RUN, "!!!")
    norm = F.regexp_replace(s, NORM_QMARK_RUN, "???")
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.regexp_count(t, F.lit(NORM_ZERO_WIDTH))
        .cast("long")
        .alias("n_zero_width"),
        F.regexp_count(t, F.lit(NORM_CTRL)).cast("long").alias("n_ctrl"),
        (norm != t).alias("changed"),
    )


# ------------------------------------------------------ repetition stats
def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition-based quality signals — the standard web-corpus
    filters (Gopher/C4 style): duplicate-token and duplicate-bigram
    fractions plus the heaviest single token's share of the document.

    Columns: (doc_id, n_tokens, n_distinct, distinct_ratio, top_share,
    dup_bigram_ratio), ratios rounded to 6 places; empty docs yield
    n_tokens=0 and NULL ratios.

    Scale shape: one explode + ONE map-side-combined two-level
    aggregation keyed by doc_id (token counts, then per-doc stats), and
    a distinct-bigram aggregation reusing dedup.word_shingles' gram
    builder; both shuffles are on doc_id, so data volume after the
    partial agg is O(distinct tokens per doc), not O(corpus tokens)."""
    from engine.spark import dedup as _dedup

    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), WS)
        ).alias("tok"),
    ).where(F.col("tok") != "")
    per_tok = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    stats = per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    bigrams = (
        _dedup.word_shingles(docs, n=2, text_col=text_col)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_distinct_bigrams"))
    )
    return (
        stats.join(bigrams, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            F.round(F.col("n_distinct") / F.col("n_tokens"), 6).alias(
                "distinct_ratio"
            ),
            F.round(F.col("top_c") / F.col("n_tokens"), 6).alias("top_share"),
            F.when(
                F.col("n_tokens") > 1,
                F.round(
                    1
                    - F.col("n_distinct_bigrams")
                    / (F.col("n_tokens") - 1),
                    6,
                ),
            ).alias("dup_bigram_ratio"),
        )
    )


# --------------------------------------------------------- doc chunking
def doc_chunks(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking for context-length-bounded
    training: token windows of ``chunk_tokens`` advancing by
    ``chunk_tokens - overlap``, last window allowed short, every doc
    yielding at least one chunk.

    Columns: (doc_id, chunk_idx, chunk_text, n_tokens).

    Scale shape: zero shuffle — split once into a materialized token
    array (NOT inside a higher-order-function lambda; see
    dedup.word_shingles for the measured O(tokens²) trap), posexplode a
    chunk-index sequence, then one slice + array_join per chunk.  At
    100 TB this is a pure generate-projection over the scan; output
    rows ≈ input tokens / stride."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    tokd = docs.select(
        "doc_id",
        F.split(F.trim(F.lower(F.col(text_col))), WS).alias("_toks"),
    ).withColumn(
        "_n",
        F.when(
            (F.size("_toks") == 1) & (F.element_at("_toks", 1) == ""),
            F.lit(0),
        ).otherwise(F.size("_toks")),
    )
    # number of windows: 1 + ceil(max(n - chunk, 0) / stride)
    n_chunks = 1 + F.ceil(
        F.greatest(F.col("_n") - chunk_tokens, F.lit(0))
        / F.lit(stride)
    ).cast("int")
    exploded = tokd.select(
        "doc_id",
        "_toks",
        "_n",
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias(
            "chunk_idx", "_i"
        ),
    )
    start = F.col("chunk_idx") * stride  # 0-based
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join(
            F.slice(F.col("_toks"), start + 1, chunk_tokens), " "
        ).alias("chunk_text"),
        F.least(
            F.lit(chunk_tokens), F.greatest(F.col("_n") - start, F.lit(0))
        )
        .cast("long")
        .alias("n_tokens"),
    )


# ------------------------------------------------------ sequence packing
def pack_sequences(
    docs: DataFrame,
    capacity: int = 512,
    n_buckets: int = 8,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic offset-interval sequence packing: documents are
    laid head-to-tail in a per-(group, bucket) token stream ordered by
    doc_id, and each doc's bin is the capacity-aligned window containing
    its START offset — bin_id = floor((cumsum - n_tokens) / capacity).

    This is NOT bin packing with a hard capacity: a doc that starts near
    a bin boundary overflows its bin by up to its own length.  The exact
    guarantees (both pinned by tests/test_llm_ops.py property tests):

    * **load bound** — every bin's token total ≤ ``capacity +
      max_doc_tokens − 1`` (a doc can start at most ``capacity − 1``
      tokens into its bin, and everything else in the bin lies inside
      the bin's capacity-sized offset window);
    * **bin-count bound** — bins per (group, bucket) =
      ``floor((total_tokens − last_doc_tokens) / capacity) + 1``
      ≤ ``total_tokens / capacity + 1``, i.e. average fill approaches
      ``capacity`` — no fragmentation, unlike true next-fit whose bins
      can be half-empty.

    Chosen over true next-fit (close a bin the moment an item doesn't
    fit) because the offset rule is a pure window function — one
    shuffle, no sequential recurrence — and is exactly expressible in
    ANSI SQL, so the DuckDB oracle pins it bit-for-bit.  Consumers that
    need a hard per-bin token ceiling should size ``capacity`` as
    ``target − max_doc_tokens + 1`` or pre-chunk long docs with
    :func:`doc_chunks` so ``max_doc_tokens ≤`` the slack they can
    absorb.

    Hot-key shape (same two-phase idea as joins.asof_join): the window
    partition is (group, doc_id % n_buckets), never the whole group, so
    a group holding 10^10 docs spreads over n_buckets bounded sort
    partitions instead of serializing one reducer; bins are independent
    per bucket (bin ids only unique per (group, bucket))."""
    t = F.col(text_col)
    from pyspark.sql import Window

    base = docs.select(
        "doc_id",
        F.col(group_col).alias("grp"),
        F.pmod(F.col("doc_id"), F.lit(n_buckets)).cast("int").alias("bucket"),
        ws_token_count(t).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("grp", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return base.select(
        "doc_id",
        F.col("grp").alias(group_col),
        "bucket",
        F.floor((cum - F.col("n_tokens")) / capacity)
        .cast("long")
        .alias("bin_id"),
        "n_tokens",
    )


# ---------------------------------------------------- n-gram LM scoring
def ngram_lm_scores(
    docs: DataFrame,
    ref_docs: DataFrame,
    alpha: float = 1.0,
    text_col: str = "text",
) -> DataFrame:
    """Bigram language-model document scoring — the CCNet-style quality
    filter (Wenzek et al., "CCNet: Extracting High Quality Monolingual
    Datasets from Web Crawl Data"): train an add-α-smoothed bigram LM on
    a reference corpus, score every document by its average per-bigram
    negative log-likelihood (the perplexity proxy); high avg_nll =
    out-of-distribution/gibberish, the standard pre-training drop gate.

        logp(w2 | w1) = ln( (c(w1,w2) + α) / (c(w1) + α·V) )

    with V = training vocabulary size + 1 (the OOV bucket); unseen
    words/bigrams coalesce to count 0, so a fully-OOV document scores
    -ln(V) per bigram.  Only documents with ≥ 2 tokens produce a row.

    Scale shape: training is two hash aggregations with map-side
    combine (unigram + bigram counts — hot function words never buffer);
    V rides as a broadcast single-row aggregate (no driver action during
    construction); scoring joins the exploded doc bigrams to the count
    tables on token equi-keys (sort-merge at model scale, AQE skew-split
    absorbs the "of the" hot keys) — never a cartesian, and the corpus
    is scanned once per side.

    Cross-engine determinism: per-row log-probs are rounded to 6 dp and
    summed as DECIMAL(20,6) — an exact, order-independent accumulation
    both engines agree on bit-for-bit (double partial-agg order would
    drift in the last ulp) — then one double division at the end."""

    def _tok(d: DataFrame, *extra: str) -> DataFrame:
        return d.select(
            *extra,
            F.filter(
                F.split(F.trim(F.lower(F.col(text_col))), WS),
                lambda t: t != "",
            ).alias("_t"),
        )

    rt = _tok(ref_docs).where(F.size("_t") >= 1)
    uni = (
        rt.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    vocab = uni.agg((F.count("*") + 1).cast("double").alias("_v"))
    rp = rt.where(F.size("_t") >= 2)
    pairs = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.size("_t") - 2),
            lambda i: F.struct(
                F.get("_t", i).alias("w1"), F.get("_t", i + 1).alias("w2")
            ),
        )
    ).alias("p")
    big = (
        rp.select(pairs)
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
    )

    sp = (
        _tok(docs, "doc_id")
        .where(F.size("_t") >= 2)
        .select("doc_id", pairs)
        .select("doc_id", "p.w1", "p.w2")
    )
    j = (
        sp.join(big, ["w1", "w2"], "left")
        .join(uni.withColumnRenamed("w", "w1"), "w1", "left")
        .crossJoin(F.broadcast(vocab))
    )
    logp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(alpha))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha) * F.col("_v"))
    )
    return (
        j.select(
            "doc_id", F.round(logp, 6).cast("decimal(20,6)").alias("lp")
        )
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("lp").alias("_s"))
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                (-F.col("_s")).cast("double") / F.col("n_bigrams"), 6
            ).alias("avg_nll"),
        )
    )


def vocab_coverage(
    docs: DataFrame, vocab_size: int = 500, text_col: str = "text"
) -> DataFrame:
    """Tokenizer-prep vocabulary coverage: build the top-``vocab_size``
    corpus vocabulary (count DESC, token ASC — a deterministic boundary
    in both engines) and measure per-language out-of-vocabulary rates.

    Scale shape: token counts aggregate with map-side combine on the
    high-cardinality token key; the global top-V plans as
    TakeOrderedAndProject (distributed top-k, never a full sort); the
    V-row vocabulary broadcasts back onto the exploded token stream, so
    corpus rows are never shuffled — the only corpus-wide exchange is
    the final per-language partial aggregation.
    """
    toks = docs.select(
        "lang",
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), WS)
        ).alias("tok"),
    ).where(F.col("tok") != "")
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    joined = toks.join(F.broadcast(vocab), "tok", "left")
    return (
        joined.groupBy("lang")
        .agg(
            F.count("*").alias("total_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("oov_tokens"),
        )
        .withColumn(
            "oov_rate",
            F.round(
                F.col("oov_tokens").cast("double")
                / F.col("total_tokens"),
                6,
            ),
        )
    )


def bpe_merge_stats(
    docs: DataFrame, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Adjacent-pair frequency table over the BPE pre-tokenization —
    the candidate statistic of one BPE-training merge iteration (the
    full training loop is a driver-coordinated iteration of exactly
    this job over a shrinking pair table).

    Returns the top-``k`` (left_tok, right_tok, cnt) pairs with a fully
    deterministic order (cnt DESC, left ASC, right ASC).

    Scale shape: tokenize + pair-zip are zero-shuffle codegen (slice +
    arrays_zip + posexplode-free explode); the only corpus-wide
    exchange is the partial-aggregating pair count, and the top-k plans
    as TakeOrderedAndProject — never a global sort.
    """
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0)
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = docs.select(
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, n).alias("l"),
                F.slice(toks, 2, n).alias("r"),
            )
        ).alias("p")
    ).select(
        F.col("p.l").alias("left_tok"), F.col("p.r").alias("right_tok")
    )
    return (
        pairs.groupBy("left_tok", "right_tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(
            F.col("cnt").desc(),
            F.col("left_tok").asc(),
            F.col("right_tok").asc(),
        )
        .limit(k)
    )


def table_cells(
    docs: DataFrame,
    md_col: str = "markdown",
    id_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Markdown-table extraction into relational rows: one output row
    per table cell, keyed by (ids…, line_no, col_idx), 1-based.

    A table line is ``|``-delimited with leading and trailing pipes;
    separator rows (``| --- | --- |``) are dropped.  Cells are the
    inner splits, space-trimmed.  All codegen (split + posexplode +
    rlike), zero shuffle — the relational bridge from extracted
    markdown to SQL-queryable table data.
    """
    ids = [F.col(c) for c in id_cols]
    lines = docs.select(
        *ids,
        F.posexplode(F.split(F.col(md_col), "\n")).alias("ln0", "line"),
    )
    is_table = F.col("line").rlike(r"^\|.*\|$") & ~F.col("line").rlike(
        r"^\|[-| ]+\|$"
    )
    t = lines.where(is_table)
    parts = F.split(F.col("line"), r"\|")
    inner = F.slice(parts, 2, F.greatest(F.size(parts) - 2, F.lit(0)))
    return t.select(
        *ids,
        (F.col("ln0") + 1).alias("line_no"),
        F.posexplode(inner).alias("ci0", "c"),
    ).select(
        *ids,
        "line_no",
        (F.col("ci0") + 1).alias("col_idx"),
        F.trim("c").alias("cell"),
    )


# ------------------------------------------------------------- BM25
def bm25_topk(
    docs: DataFrame,
    query_terms: "Sequence[str]",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 top-k retrieval over the corpus for ONE query (a
    literal bag of terms): the inverted-index scoring shape —
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf(t) = ln(1 + (N−df+0.5)/(df+0.5)).

    Returns (doc_id, score, rank) for the k best documents, ties broken
    by doc_id so ranking is deterministic across engines.

    Cross-engine exactness: per-term scores are rounded to 6 dp and
    accumulated as DECIMAL(20,6), so the per-doc sum is associative and
    the DuckDB twin cannot drift on float-sum order (the same device as
    ``ngram_lm_scores``).

    Scale notes: the exploded token stream is filtered to the query's
    terms BEFORE any shuffle (an `isin` literal filter riding the scan
    projection — at 10^12 turns this is the difference between
    shuffling every token and shuffling only matching postings); tf is
    one partial-agg groupBy on (doc, term); df reduces that tiny table
    again; corpus size and avgdl ride as ONE broadcast single-row
    aggregate, never a driver collect; the df table (≤ |query| rows)
    broadcasts into the scoring join; final top-k is TakeOrdered —
    never a global sort.  For a query WORKLOAD (many queries), the same
    plan applies with a broadcast (query_id, term) table and the
    groupBys keyed by (query_id, doc) — shape unchanged.
    """
    terms = sorted(set(query_terms))
    stats = docs.agg(
        F.count("*").alias("_n_docs"),
        F.avg(ws_token_count(F.col(text_col))).alias("_avgdl"),
    )
    toks = docs.select(
        "doc_id",
        ws_token_count(F.col(text_col)).alias("dl"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), WS)).alias(
            "term"
        ),
    ).where(F.col("term").isin(terms))
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("_n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("_avgdl")
                    )
                ),
                6,
            )
            .cast("decimal(20,6)")
            .alias("_s"),
        )
    )
    from pyspark.sql import Window

    # the window runs over the k already-selected rows, not the corpus
    rank_w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("_s").cast("decimal(20,6)").alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .select(
            "doc_id",
            "score",
            F.row_number().over(rank_w).cast("long").alias("rank"),
        )
    )


# ------------------------------------------------------ token entropy
def token_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Shannon entropy of each document's unigram distribution —
    H(d) = −Σ_t (c_t/n)·ln(c_t/n) — the corpus-filtering signal that
    separates natural prose (high entropy) from template/repetition
    spam (low entropy); complements ``repetition_stats`` which looks at
    adjacency, not distribution.

    Returns (doc_id, n_tokens, distinct_tokens, entropy DECIMAL(20,6)).

    Cross-engine exactness: each per-term contribution is rounded to
    6 dp and accumulated as DECIMAL(20,6) (the ``ngram_lm_scores``
    device), so the per-doc sum is aggregation-order-proof.

    Scale notes: one explode + ONE partial-agg shuffle on (doc, term);
    the per-doc token total comes from the same aggregate via a second
    partial agg on doc_id — never a window over the token stream.
    Empty docs emit entropy 0 with n_tokens 0."""
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), WS)).alias(
            "term"
        ),
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    totals = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.count("*").alias("distinct_tokens")
    )
    p = F.col("c").cast("double") / F.col("n").cast("double")
    contrib = F.round(-(p * F.log(p)), 6).cast("decimal(20,6)")
    ent = (
        tf.join(totals, "doc_id")
        .select("doc_id", contrib.alias("_h"))
        .groupBy("doc_id")
        .agg(F.sum("_h").cast("decimal(20,6)").alias("entropy"))
    )
    return (
        docs.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(ent, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("distinct_tokens"), F.lit(0))
            .cast("long")
            .alias("distinct_tokens"),
            F.coalesce(
                F.col("entropy"), F.lit(0).cast("decimal(20,6)")
            ).alias("entropy"),
        )
    )


def posting_lists(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = 64,
) -> DataFrame:
    """Inverted-index posting-list construction — the retrieval-serving
    sink that BM25 scoring reads: one row per distinct term with its
    document frequency and (for non-stopword terms) the sorted posting
    list, serialized as a comma-joined id string so the row is
    engine-hashable.

    Scale discipline: ``collect_list`` on an uncapped term is the
    classic single-reducer OOM — a stopword's postings at 10^10 docs is
    the corpus itself.  So df is computed first as a mergeable partial
    agg for EVERY term, and the posting array is materialized only for
    terms with df ≤ ``max_df`` (a broadcast-able key set semi-joined
    into the token stream BEFORE the collect) — the df-cap discipline
    shared with ngram_jaccard_pairs/tfidf.  Capped terms keep df with a
    NULL posting string; production shards those by (term, bucket) if
    it needs them at all.
    """
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), WS)
            ).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    df_tab = toks.groupBy("term").agg(F.count("*").alias("df"))
    small = df_tab.filter(F.col("df") <= max_df).select("term")
    postings = (
        toks.join(small, "term")
        .groupBy("term")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.col("doc_id"))),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings")
        )
    )
    return df_tab.join(postings, "term", "left").select(
        "term", "df", "postings"
    )


def dsir_weights(
    docs: DataFrame,
    target_pred: Column,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023,
    arXiv:2302.03169): per-document log importance ratio between a
    target distribution (rows matching ``target_pred``) and the full
    corpus, over HASHED token features — the hash-bucket trick is what
    makes the method scale-free: the feature space is a fixed
    ``n_buckets`` regardless of vocabulary, so both "n-gram LMs" are
    ≤ n_buckets-row tables.

    log w(d) = Σ_b c_d(b) · [ln p̂_tgt(b) − ln p̂_src(b)],  add-1
    smoothed.  Cross-engine discipline: the per-bucket log-ratio is
    computed once in IEEE double, ROUNDED to 6 dp, and the per-doc sum
    accumulates count × rounded-ratio as DECIMAL(20,6) — aggregation-
    order-proof (the ngram_lm_score discipline).  Buckets hash via the
    portable md5-prefix integer.

    Shapes at 10^12 docs: token explode → (doc, bucket) partial agg;
    the two corpus LMs are partial aggs collapsing to ≤ n_buckets
    rows; the ratio table broadcasts back onto the per-doc bucket
    counts; final per-doc sum is one partial-agg shuffle on doc_id.
    The corpus is never joined against itself.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        target_pred.alias("is_tgt"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), WS)
        ).alias("tok"),
    ).where(F.col("tok") != "")
    bucketed = toks.select(
        "doc_id",
        "is_tgt",
        F.pmod(
            F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast(
                "long"
            ),
            F.lit(n_buckets),
        ).alias("b"),
    )
    doc_counts = bucketed.groupBy("doc_id", "b").agg(
        F.count("*").alias("c")
    )
    lm = bucketed.groupBy("b").agg(
        F.count("*").alias("n_src"),
        F.sum(F.when(F.col("is_tgt"), 1).otherwise(0)).alias("n_tgt"),
    )
    totals = lm.agg(
        F.sum("n_src").alias("t_src"), F.sum("n_tgt").alias("t_tgt")
    )
    ratio = (
        lm.crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.round(
                F.log(
                    (F.col("n_tgt") + 1).cast("double")
                    / (F.col("t_tgt") + n_buckets).cast("double")
                )
                - F.log(
                    (F.col("n_src") + 1).cast("double")
                    / (F.col("t_src") + n_buckets).cast("double")
                ),
                6,
            ).alias("r"),
        )
    )
    return (
        doc_counts.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum(
                (F.col("c").cast("decimal(20,6)"))
                * F.col("r").cast("decimal(20,6)")
            )
            .cast("decimal(20,6)")
            .alias("log_weight")
        )
    )


def ngram_diversity(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group corpus diversity: distinct-bigram / total-bigram ratio
    (the bigram type–token ratio) — the cheap self-repetition signal at
    corpus granularity (a source whose crawler loops emits few distinct
    bigrams; synthetic data collapses here long before per-doc
    repetition_stats fire).

    Shape: bigrams pair up JVM-side via zip_with over two array slices
    (zero shuffle, no O(n²) re-split); the per-group count(DISTINCT
    bigram) plans as the two-stage distinct aggregate — partial
    distinct on (group, bigram), then the count — so a hot group never
    materializes its distinct set on one reducer.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), WS)
    n = F.size(toks)
    bigrams = F.when(n >= 2, F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )).otherwise(F.array().cast("array<string>"))
    ex = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(bigrams).alias("bigram"),
    )
    return (
        ex.groupBy("grp")
        .agg(
            F.count("*").alias("total_bigrams"),
            F.countDistinct("bigram").alias("distinct_bigrams"),
        )
        .select(
            F.col("grp").alias(group_col),
            "total_bigrams",
            "distinct_bigrams",
            F.round(
                F.col("distinct_bigrams").cast("double")
                / F.col("total_bigrams"),
                6,
            ).alias("diversity"),
        )
    )


# -------------------------------------------- trigram substring search
def trigram_postings(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Character-trigram posting lists: (doc_id, tg) — one row per
    distinct lowercase 3-char substring per document (pg_trgm's index
    model).  Built JVM-side (sequence → substr transform → distinct →
    explode, zero Python); docs shorter than 3 chars index nothing.
    In production this table is the persisted index — written
    bucketed/sorted by tg so a query's posting reads are pruned scans."""
    tokd = docs.filter(F.length(text_col) >= 3).select(
        "doc_id", F.lower(F.col(text_col)).alias("_t")
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.length("_t") - 2),
        lambda i: F.substr(F.col("_t"), i, F.lit(3)),
    )
    return tokd.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("tg")
    )


def trigram_postings_for(
    docs: DataFrame, grams: list[str], text_col: str = "text"
) -> DataFrame:
    """Posting rows restricted to a KNOWN gram set — value-identical to
    ``trigram_postings(docs).filter(tg.isin(grams))`` (a doc's distinct
    trigram set contains g iff ``instr(lower(text), g) > 0``), but
    computed with |grams| substring probes per document instead of
    materializing and exploding every trigram of the corpus and then
    discarding all but |grams| of them.  This is the query-time analog
    of a pruned index read: only the requested posting lists are ever
    produced.  Probe count is bounded by the caller (query trigrams),
    so the per-doc cost is O(|grams| · len) JVM ``instr`` scans with
    zero per-trigram string allocation."""
    lit_grams = F.array(*[F.lit(g) for g in sorted(set(grams))])
    tokd = docs.filter(F.length(text_col) >= 3).select(
        "doc_id", F.lower(F.col(text_col)).alias("_t")
    )
    return tokd.select(
        "doc_id",
        F.explode(
            F.filter(lit_grams, lambda g: F.instr(F.col("_t"), g) > 0)
        ).alias("tg"),
    )


def substring_search(
    docs: DataFrame,
    query: str,
    text_col: str = "text",
    prune_grams: int | None = None,
) -> DataFrame:
    """Substring search via the trigram index (pg_trgm's LIKE
    acceleration): a doc can contain ``query`` only if it contains
    EVERY trigram of the query, so candidates = posting-list
    intersection, then the exact ``instr`` verify runs on candidates
    only.  Result is exactly the full-scan ``contains`` filter —
    (doc_id, first_pos), 1-based — for any corpus.

    Scale shape: the posting scan is filtered to the query's trigrams
    (a pushed IN-filter on the index's sort/bucket key — reads only
    those lists, never the corpus), the intersection is one partial-agg
    groupBy on doc_id, and the corpus itself is touched once, semi-
    joined down to candidates, for the verify.  ``prune_grams=k`` keeps
    only the k RAREST query trigrams (by corpus document frequency) as
    the candidate generator — requiring fewer grams only WIDENS the
    candidate superset, so correctness is unaffected while a long
    query's common trigrams (huge postings) never get read; the
    rarest-first discipline of every candidate-generation op here.

    Queries shorter than 3 chars can't use the index — falls back to
    the documented full-scan filter.
    """
    q = query.lower()
    base = docs.select("doc_id", text_col)
    verify_pos = F.instr(F.lower(F.col(text_col)), q)
    if len(q) < 3:
        return (
            base.select("doc_id", verify_pos.alias("first_pos"))
            .filter(F.col("first_pos") > 0)
        )
    qgrams = sorted({q[i : i + 3] for i in range(len(q) - 2)})
    need = qgrams
    if prune_grams is not None and prune_grams < len(qgrams):
        dfs = (
            trigram_postings_for(docs, qgrams, text_col)
            .groupBy("tg")
            .agg(F.count("*").alias("df"))
            .collect()
        )  # ≤ |query| rows — metadata-scale
        by_df = {r["tg"]: r["df"] for r in dfs}
        # a query trigram absent from the corpus ⇒ no doc can match
        if len(by_df) < len(qgrams):
            return base.select(
                "doc_id", verify_pos.alias("first_pos")
            ).filter(F.lit(False))
        need = sorted(qgrams, key=lambda g: (by_df[g], g))[:prune_grams]
    cand = (
        trigram_postings_for(docs, need, text_col)
        .groupBy("doc_id")
        .agg(F.countDistinct("tg").alias("_ng"))
        .filter(F.col("_ng") == len(need))
        .select("doc_id")
    )
    return (
        base.join(cand, "doc_id", "left_semi")
        .select("doc_id", verify_pos.alias("first_pos"))
        .filter(F.col("first_pos") > 0)
    )


def hashed_classifier_score(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int = 1 << 20,
    bias_milli: int = 0,
    text_col: str = "text",
) -> DataFrame:
    """fastText-style linear classifier INFERENCE over hashed
    bag-of-words features — the quality-filter shape used by CCNet /
    LLaMA-style corpus pipelines (a linear model over hashed token
    features deciding keep/drop per document).

    ``weights`` is a (fid, w_milli) table: feature id = portable 60-bit
    md5 hash of the token mod ``n_buckets``, weight as integer
    MILLI-units — the score is Σ count(tok)·w_milli + bias, pure
    BIGINT arithmetic, so the verdict for every document is exact on
    any engine (no float dot product, no sigmoid; the sign of the
    linear score IS the decision, monotone in the probability).

    Scale shape (100 TB): token explode → ONE map-side-combined count
    agg on (doc_id, fid) → BROADCAST join against the weights (even a
    full 2²⁰-bucket model is a few MB — models ride to every executor,
    documents never shuffle for the join) → one doc_id partial agg.
    Unseen features weight 0 via the left join's coalesce.

    Columns: (doc_id, n_tokens, score_milli, label)."""
    from engine.spark.dedup import portable_hash60  # lazy: dedup imports text

    toks = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), WS)
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    feats = (
        toks.withColumn(
            "fid", portable_hash60(F.col("tok")) % F.lit(n_buckets)
        )
        .groupBy("doc_id", "fid")
        .agg(F.count("*").alias("cnt"))
    )
    scored = feats.join(F.broadcast(weights), "fid", "left").withColumn(
        "_w", F.coalesce(F.col("w_milli"), F.lit(0))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            (F.sum(F.col("cnt") * F.col("_w")) + bias_milli)
            .cast("long")
            .alias("score_milli"),
        )
        .withColumn("label", F.col("score_milli") > 0)
    )


def corpus_drift(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Distribution drift of every corpus shard against the global
    corpus: per group g, the EXACT total-variation distance between
    the group's token distribution and the whole corpus's —
    TV = ½·Σ_tok |c/N_g − glob/G| — the standard mixture-monitoring
    signal when shards are crawl snapshots, sources, or time slices.

    The sum runs over the FULL vocabulary, including tokens the group
    never saw, but no outer join against the vocab is needed: the
    missing-token mass folds in algebraically —
    Σ_all |c·G − glob·N_g| = G·N_g + Σ_{tok∈g}(|c·G − glob·N_g| −
    glob·N_g) — so only the group's own tokens are ever joined.  All
    products/sums run in DECIMAL(38,0) (BIGINT-safe at 10¹² tokens);
    only the final normalized tv is a rounded double.

    Scale shape: one (group, tok) partial agg, the global per-token
    counts derived FROM that agg (no second corpus scan), one
    tok-keyed equi-join (each token meets exactly one global row),
    the corpus total riding as a broadcast single-row literal.

    Columns: (group, n_tokens, tv)."""
    toks = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), WS)
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    counts = toks.groupBy("grp", "tok").agg(F.count("*").alias("c"))
    glob = counts.groupBy("tok").agg(F.sum("c").alias("g"))
    n_grp = counts.groupBy("grp").agg(F.sum("c").alias("n_g"))
    # NB: Spark resolves identifiers case-insensitively by default, so
    # the corpus total cannot be named "G" next to the per-token "g".
    total = n_grp.agg(F.sum("n_g").alias("tot"))
    dec = lambda c: c.cast("decimal(38,0)")
    j = (
        counts.join(glob, "tok")
        .join(n_grp, "grp")
        .crossJoin(F.broadcast(total))
    )
    inner = j.groupBy("grp", "n_g", "tot").agg(
        F.sum(
            F.abs(dec(F.col("c")) * dec(F.col("tot"))
                  - dec(F.col("g")) * dec(F.col("n_g")))
            - dec(F.col("g")) * dec(F.col("n_g"))
        ).alias("_partial")
    )
    numer = dec(F.col("tot")) * dec(F.col("n_g")) + F.col("_partial")
    return inner.select(
        F.col("grp").alias(group_col),
        F.col("n_g").alias("n_tokens"),
        F.round(
            numer.cast("double")
            / (2.0 * F.col("n_g").cast("double")
               * F.col("tot").cast("double")),
            6,
        ).alias("tv"),
    )


def vocab_growth(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 16,
    seed: str = "vg",
) -> DataFrame:
    """Heaps-law vocabulary growth curve: how many NEW distinct tokens
    each successive corpus shard contributes, and the cumulative
    vocabulary after it — the diagnostic for "is more data still
    buying vocabulary coverage?" when sizing a tokenizer corpus.

    Shard order is the deterministic portable-hash order (same family
    as ``mix.shard_shuffle``), so the curve is reproducible across
    reruns, cluster sizes, and engines.  A token's first shard is
    simply min(shard) over its occurrences — ONE partial-agg shuffle
    on the token (high-cardinality, no skewed reducer), then a
    partial-agg rollup to n_shards rows and a tiny cumulative window
    over those rows only (never over token- or doc-grain data).
    Shards contributing zero new tokens don't emit a row.

    Returns (shard, new_tokens, cum_vocab), tokens = lowercased
    whitespace split (the shared explicit ASCII class — Java/RE2
    parity).
    """
    from engine.spark.dedup import portable_hash60

    shard = F.pmod(
        portable_hash60(
            F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
        ),
        F.lit(n_shards),
    ).cast("int")
    toks = (
        docs.select(
            shard.alias("shard"),
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), WS)
            ).alias("tok"),
        )
        .where(F.length("tok") > 0)
    )
    first = toks.groupBy("tok").agg(F.min("shard").alias("shard"))
    growth = first.groupBy("shard").agg(
        F.count("*").alias("new_tokens")
    )
    from pyspark.sql import Window

    w = Window.orderBy("shard").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return growth.select(
        "shard",
        "new_tokens",
        F.sum("new_tokens").over(w).cast("long").alias("cum_vocab"),
    )


def bpe_train(
    docs: DataFrame,
    rounds: int = 4,
    text_col: str = "text",
) -> "list":
    """Distributed BPE tokenizer training — ``rounds`` true merge
    iterations, returned as the learned merge table
    [(rnd, left_tok, right_tok, merged, cnt), ...].

    The scale insight (the reason BPE trains fine at 10^12 turns): the
    corpus is touched ONCE, to build the word-frequency table (vocab-
    sized — millions of rows, not trillions); every merge round then
    runs on that compact table: one partial-aggregating pair count
    weighted by word frequency, a TakeOrdered(1) argmax (never a global
    sort), and a JVM fold applying the merge.  Words are held as
    space-joined symbol strings; the merge is a LEFT FOLD over the
    symbol array — merge the accumulator's last symbol with the current
    one when they form the pair, else append — which IS greedy leftmost
    non-overlapping merging (after a merge the new last symbol is the
    longer merged token, so it can't re-trigger as the pair's left
    side against the element that fed it).  A delimiter-based string
    ``replace`` is NOT equivalent: consecutive occurrences share a
    boundary space the replace consumes ("banana" with merge (a,n)
    under-merges to [b,an,a,n,a]); the fold handles runs correctly
    ([a,a,a,a] + (a,a) -> [aa,aa]), pinned in tests.  The DuckDB twin
    reproduces the fold with ``list_reduce`` over a string accumulator
    (an independent mechanism that must land identical merge tables).

    The one driver round-trip per round is the argmax pair (a single
    row — same metadata-only discipline as connected-components'
    convergence check).  Each round's word table is persisted and the
    previous round's released AFTER materialization (the k_core
    discipline), so lineage stays one projection deep.

    Ties on the argmax break (cnt DESC, left ASC, right ASC) —
    deterministic for ASCII symbols in both engines.
    """
    words = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0)
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.array_join(
                F.regexp_extract_all(F.col("w"), F.lit(r"."), 0), " "
            ).alias("seq"),
            "freq",
        )
    )
    words = words.persist()
    words.count()
    merges = []
    for rnd in range(1, rounds + 1):
        toks = F.split(F.col("seq"), " ")
        n = F.greatest(F.size(toks) - 1, F.lit(0))
        top = (
            words.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice(toks, 1, n).alias("l"),
                        F.slice(toks, 2, n).alias("r"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] is None:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merged = left + right
        merges.append((rnd, left, right, merged, cnt))
        if rnd == rounds:
            # the last merge is recorded — folding it into a word table
            # nobody reads would be a wasted full pass (code-review r5)
            break
        arr = F.split(F.col("seq"), " ")
        folded = F.aggregate(
            F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
            F.slice(arr, 1, 1),
            lambda acc, x: F.when(
                (F.element_at(acc, -1) == F.lit(left))
                & (x == F.lit(right)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.lit(merged)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        nxt = words.select(
            F.array_join(folded, " ").alias("seq"),
            "freq",
        ).persist()
        nxt.count()
        words.unpersist()
        words = nxt
    words.unpersist()
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: "list",
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned BPE merge table (``bpe_train`` output) to the
    corpus and return the resulting symbol-frequency table
    (symbol, cnt) — the encode half of the tokenizer, and the
    compression audit (post-merge symbol count vs raw chars).

    Same scale insight as training: merges are applied to the DISTINCT
    word table (vocab-sized), never the corpus; the corpus contributes
    only word frequencies.  Each merge is the greedy-leftmost fold from
    ``bpe_train``, composed in merge order as nested Catalyst
    expressions — fine for the tens-of-merges scale this trains; a
    production encoder with thousands of merges would loop
    fold-per-round over a persisted word table instead (the bpe_train
    iteration shape) rather than nest expressions.

    Output counts are exact BIGINTs: cnt = Σ word_freq × multiplicity.
    """
    def _merge_step(left: str, right: str, merged: str):
        # bind per-merge constants in a closure: pyspark introspects the
        # lambda's arity, so default-arg binding would be rejected
        def step(acc, x):
            return F.when(
                (F.element_at(acc, -1) == F.lit(left))
                & (x == F.lit(right)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.lit(merged)),
                ),
            ).otherwise(F.concat(acc, F.array(x)))

        return step

    seq = F.array_join(
        F.regexp_extract_all(F.col("w"), F.lit(r"."), 0), " "
    )
    for _rnd, left, right, merged, _cnt in merges:
        arr = F.split(seq, " ")
        seq = F.array_join(
            F.aggregate(
                F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
                F.slice(arr, 1, 1),
                _merge_step(left, right, merged),
            ),
            " ",
        )
    words = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0)
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        words.select(F.explode(F.split(seq, " ")).alias("symbol"), "freq")
        .groupBy("symbol")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


# URL host extraction: scheme + host captured in group 1.  The pattern
# sticks to the Java-regex ∩ RE2 common subset (explicit char class, no
# \s, no lookaround) and is shared verbatim with the DuckDB oracle;
# text is lowercased first so the class — and the emitted host — are
# case-normalized.
URL_HOST_RE = r"https?://([a-z0-9.-]+)"


def url_host_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-host URL rollup over a document corpus — the domain-level
    view every web-corpus curation recipe starts from (C4's blocklist
    filtering, RefinedWeb's per-domain quality gates, Dolma's domain
    mixing all key on the registrable host).

    Emits ``(host, n_urls, n_docs)``: total link mentions and distinct
    documents mentioning the host.  Hosts come from one codegen'd
    ``regexp_extract_all`` + ``posexplode`` — no UDF, no pre-tokenize —
    so the only shuffle is the final partial-agg groupBy on ``host``;
    ``n_docs`` plans as the two-stage distinct aggregate.  Hot hosts
    (a crawl's top domain can carry 1%+ of all links) stay safe: counts
    are mergeable partial aggs, never a per-host collect or window."""
    hosts = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(URL_HOST_RE), 1
            )
        ).alias("host"),
    )
    return hosts.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("_doc").alias("n_docs"),
    )


def distinctive_terms(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 5,
    alpha0: float = 100.0,
    min_count: int = 3,
) -> DataFrame:
    """Terms that DISTINGUISH each group from the rest of the corpus —
    Monroe/Colaresi/Quinn "Fightin' Words" log-odds with an
    informative Dirichlet prior (the principled alternative to raw
    tf-idf contrast, which overweights rare terms):

        α_w   = alpha0 · y_w / n                       (corpus prior)
        δ_sw  = ln((y_sw + α_w)/(n_s + alpha0 − y_sw − α_w))
              − ln((y¬s,w + α_w)/(n¬s + alpha0 − y¬s,w − α_w))
        z_sw  = δ_sw / sqrt(1/(y_sw + α_w) + 1/(y¬s,w + α_w))

    Top-k terms per group by z.  All counts are exact BIGINTs; each
    z is one fixed-order IEEE chain on them, so both engines rank the
    same doubles; (z desc, term asc) totalizes the order.

    Shape: one token-explode scan → partial-agg to the (group, term)
    grain; corpus term totals y_w are WINDOW sums over that reduced
    grain (no second scan — the contingency_chi2 trick); group totals
    n_s ride back via a broadcast join on the bounded group key.
    "Rest" counts are subtractions — the complement needs no second
    pass.  ``min_count`` drops corpus-rare terms BEFORE the rank
    window (their z is prior-dominated noise anyway), bounding the
    per-group sort input; for 10⁸-term vocabularies swap the window
    for global_rank's range-partition ranking.  Output: (group, term,
    y, z, rank).
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(group_col).alias("g"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), WS)).alias(
            "term"
        ),
    ).where(F.col("term") != "")
    gt = toks.groupBy("g", "term").agg(F.count("*").alias("y"))
    w_term = Window.partitionBy("term")
    # the corpus total is a broadcast single-row aggregate, NOT an
    # empty-partition window: the (group, term) grain is vocab-sized
    # (10^8 rows at 100 TB), far past the "metadata through one task"
    # budget the bounded-cell windows elsewhere rely on; ReusedExchange
    # dedupes the shared grain subtree (the Q11 discipline)
    n_tot = gt.agg(F.sum("y").alias("n"))
    grain = gt.select(
        "g",
        "term",
        "y",
        F.sum("y").over(w_term).alias("yw"),
    ).crossJoin(F.broadcast(n_tot)).where(F.col("yw") >= min_count)
    totals = gt.groupBy("g").agg(F.sum("y").alias("ns"))
    j = grain.join(F.broadcast(totals), "g")
    yd, ywd, nd, nsd = (
        F.col(c).cast("double") for c in ["y", "yw", "n", "ns"]
    )
    aw = F.lit(alpha0) * ywd / nd
    yr = ywd - yd            # rest count for the term
    nr = nd - nsd            # rest total
    a0 = F.lit(alpha0)
    delta = F.log((yd + aw) / (nsd + a0 - yd - aw)) - F.log(
        (yr + aw) / (nr + a0 - yr - aw)
    )
    z = delta / F.sqrt(1.0 / (yd + aw) + 1.0 / (yr + aw))
    scored = j.select(
        F.col("g").alias(group_col),
        "term",
        "y",
        F.round(z, 6).alias("z"),
    )
    w_rank = Window.partitionBy(group_col).orderBy(
        F.col("z").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= k)
    )


def source_divergence(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the groups' unigram
    distributions — "how different are these corpus slices, and which
    pair is safe to merge?" — the principled corpus-mixing distance
    (symmetric, bounded by ln 2, defined even where supports differ).

    JS(P‖Q) = ½ Σ_w P(w)·ln(P/M) + ½ Σ_w Q(w)·ln(Q/M), M = (P+Q)/2,
    with a term absent from one side contributing p·ln 2 from the
    other (the CASE guards the 0·ln 0 NaN in BOTH engines).  The
    Σ over the vocabulary is float-order-hazardous, so it rides the
    round-then-sum device: each term's contribution is one fixed IEEE
    chain on exact counts, rounded to 12 dp, summed as exact
    DECIMAL(38,12) — aggregation-order-free, bit-identical across
    engines.

    Shape: one token-explode scan to the (group, term) grain; group
    totals and the (a, b) pair dim are tiny aggregates of that SAME
    grain — Catalyst dedupes the shared subtree via ReusedExchange
    (the Q11 discipline), so the corpus is still scanned once; the
    a-side and b-side term vectors meet in ONE full-outer equi-join on
    (term, pair) — |terms|·|pairs| rows, with |groups| bounded (a few
    dozen corpus slices), never a cartesian over fact rows.  Output:
    (source_a, source_b, n_terms, js) with js in nats ≤ ln 2.
    """
    toks = docs.select(
        F.col(group_col).alias("g"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), WS)).alias(
            "term"
        ),
    ).where(F.col("term") != "")
    gt = toks.groupBy("g", "term").agg(F.count("*").alias("y"))
    totals = gt.groupBy("g").agg(F.sum("y").alias("n"))
    pairs = (
        totals.select(
            F.col("g").alias("sa"), F.col("n").alias("na")
        )
        .join(
            totals.select(
                F.col("g").alias("sb"), F.col("n").alias("nb")
            ),
            F.col("sa") < F.col("sb"),
        )
    )
    a_side = gt.join(
        F.broadcast(pairs), gt.g == F.col("sa")
    ).select("term", "sa", "sb", "na", "nb", F.col("y").alias("ya"))
    # rename the b-side's term: both sides derive from gt, so a
    # dataframe-qualified term == term would resolve to one attribute
    # (the ambiguous-self-join trap changepoint documents)
    b_side = gt.join(
        F.broadcast(pairs), gt.g == F.col("sb")
    ).select(
        F.col("term").alias("term2"),
        F.col("sa").alias("sa2"),
        F.col("sb").alias("sb2"),
        F.col("na").alias("na2"),
        F.col("nb").alias("nb2"),
        F.col("y").alias("yb"),
    )
    m = a_side.join(
        b_side,
        (F.col("term") == F.col("term2"))
        & (F.col("sa") == F.col("sa2"))
        & (F.col("sb") == F.col("sb2")),
        "full_outer",
    ).select(
        F.coalesce(F.col("sa"), F.col("sa2")).alias("sa"),
        F.coalesce(F.col("sb"), F.col("sb2")).alias("sb"),
        F.coalesce(F.col("na"), F.col("na2")).alias("na"),
        F.coalesce(F.col("nb"), F.col("nb2")).alias("nb"),
        F.coalesce(F.col("ya"), F.lit(0)).cast("long").alias("ya"),
        F.coalesce(F.col("yb"), F.lit(0)).cast("long").alias("yb"),
    )
    pa = F.col("ya").cast("double") / F.col("na").cast("double")
    pb = F.col("yb").cast("double") / F.col("nb").cast("double")
    mm = 0.5 * (pa + pb)
    contrib = F.when(F.col("ya") > 0, 0.5 * (pa * F.log(pa / mm))).otherwise(
        F.lit(0.0)
    ) + F.when(F.col("yb") > 0, 0.5 * (pb * F.log(pb / mm))).otherwise(
        F.lit(0.0)
    )
    return (
        m.select(
            "sa",
            "sb",
            F.round(contrib, 12).cast("decimal(18,12)").alias("cw"),
        )
        .groupBy(F.col("sa").alias("source_a"), F.col("sb").alias("source_b"))
        .agg(
            F.count("*").alias("n_terms"),
            F.round(
                F.sum("cw").cast("decimal(38,12)").cast("double"), 8
            ).alias("js"),
        )
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 30,
    min_count: int = 3,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information — word pairs
    that co-occur far above chance ("new york", "machine learning") —
    the phrase-mining primitive (Mikolov-style phrase joining uses
    exactly this score).

    PMI(w1,w2) = ln(c₁₂·N / (c₁·c₂)) over ADJACENT token bigrams,
    with the unigram marginals c₁ (as left word) and c₂ (as right
    word) and the bigram total N all WINDOW sums over the already-
    reduced bigram table — ONE token scan, zero joins (the marginal
    self-joins Catalyst would re-expand into extra scans; the
    marginal windows are per-vocab-key partition AGGREGATES, no sort).
    ``min_count`` filters AFTER the marginals (they must count every
    bigram) and bounds the TakeOrderedAndProject top-k input.  PMI is
    one fixed IEEE chain on exact BIGINTs; (pmi desc, w1, w2)
    totalizes the order.  Output: (w1, w2, c, pmi).
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col("doc_id"),
        F.split(F.trim(F.lower(F.col(text_col))), WS).alias("ts"),
    )
    bigrams = (
        toks.select(
            F.explode(
                F.filter(
                    F.zip_with(
                        F.slice("ts", 1, F.greatest(F.size("ts") - 1, F.lit(0))),
                        F.slice("ts", 2, F.greatest(F.size("ts") - 1, F.lit(0))),
                        lambda a, b: F.struct(
                            a.alias("w1"), b.alias("w2")
                        ),
                    ),
                    lambda s: (s["w1"] != "") & (s["w2"] != ""),
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
    )
    # bigram total as a broadcast single-row agg — the bigram grain is
    # vocab^2-sized, so an empty-partition window here would funnel it
    # through one task (see distinctive_terms); ReusedExchange dedupes
    n_tot = bigrams.agg(F.sum("c").alias("n"))
    marg = bigrams.select(
        "w1",
        "w2",
        "c",
        F.sum("c").over(Window.partitionBy("w1")).alias("c1"),
        F.sum("c").over(Window.partitionBy("w2")).alias("c2"),
    ).crossJoin(F.broadcast(n_tot))
    cd, c1, c2, nd = (
        F.col(x).cast("double") for x in ["c", "c1", "c2", "n"]
    )
    pmi = F.log((cd * nd) / (c1 * c2))
    return (
        marg.where(F.col("c") >= min_count)
        .select("w1", "w2", "c", F.round(pmi, 6).alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(k)
    )


def ngram_novelty(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document n-gram NOVELTY against everything earlier in the
    corpus order — what fraction of a doc's n-grams has never appeared
    in any lower-id document?  Low novelty late in a crawl = the crawl
    is re-reading itself; the diversity-decay curve this feeds is the
    go/no-go for another scrape round (the corpus-level complement of
    pairwise near-dup).

    Each distinct (gram, doc) pair charges the gram's FIRST owner:
    one explode scan to the (gram, doc) grain, one partial agg for the
    gram's min doc id, one equi-join back on the gram key
    (ReusedExchange dedupes the shared grain subtree — the corpus is
    tokenized once), one per-doc rollup.  A gram repeated INSIDE a doc
    counts once (distinct grain) — novelty is about the corpus, not
    in-doc repetition (repetition_stats owns that).  Exact integer
    counts; the ratio is one correctly-rounded division.  Output:
    (doc_id, n_grams, n_novel, novelty) for docs with ≥1 gram.
    """
    toks = docs.select(
        F.col(id_col).alias("d"),
        F.split(F.trim(F.lower(F.col(text_col))), WS).alias("ts"),
    )
    # filter short docs BEFORE building the index sequence:
    # F.sequence(1, 0) would generate a DESCENDING [1, 0] (Spark picks
    # step -1 automatically), not an empty list
    grams = (
        toks.where(F.size("ts") >= n)
        .select(
            "d",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - (n - 1)),
                    lambda i: F.concat_ws(
                        "\x1f", F.slice("ts", i, n)
                    ),
                )
            ).alias("g"),
        )
        .distinct()
    )
    first = grams.groupBy("g").agg(F.min("d").alias("first_d"))
    return (
        grams.join(first, "g")
        .groupBy(F.col("d").alias(id_col))
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("first_d") == F.col("d"), 1).otherwise(0)
            ).cast("long").alias("n_novel"),
        )
        .select(
            id_col,
            "n_grams",
            "n_novel",
            F.round(
                F.col("n_novel").cast("double")
                / F.col("n_grams").cast("double"),
                6,
            ).alias("novelty"),
        )
    )
