"""Deduplication operators for web-scale corpora.

All distributed-by-construction: shingling is explode-based, signatures
are aggregations, candidate generation is an equi-join on band/bucket
keys — never an O(n²) cross join.  Exact + n-gram Jaccard have ANSI-SQL
oracles; MinHash-LSH and SimHash are verified by property tests
(planted near-duplicates must be found).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from engine.spark.text import fingerprint

# ----------------------------------------------------------------- exact


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup on normalised text: one shuffle on the
    md5 fingerprint (map-side partial agg), keeps the lowest doc_id."""
    return (
        docs.select("doc_id", fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("dup_count"),
        )
    )


# -------------------------------------------------------------- shingles
def word_shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle).

    Built JVM-side: split → transform over a sequence of start offsets →
    explode.  No Python."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    # i in 0..max(size-n, 0) inclusive: full grams when size≥n, a single
    # short gram (all tokens) otherwise
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return (
        docs.select("doc_id", F.explode(F.array_distinct(grams)).alias("shingle"))
    )


# --------------------------------------------------------- n-gram Jaccard
def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    min_shared: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Candidate pairs sharing ≥min_shared n-gram shingles, with exact
    Jaccard.  Equi-join on shingle (never cross join); AQE handles hot
    shingles."""
    sh = word_shingles(docs, n, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        shared.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "shared",
            F.round(
                F.col("shared")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("shared")),
                4,
            ).alias("jaccard"),
        )
    )


# ------------------------------------------------------------ MinHash-LSH
def minhash_signatures(
    docs: DataFrame, num_perm: int = 32, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """(doc_id, sig: array<bigint>) via k universal-hash permutations
    h_i(x) = (a_i * x + b_i) mod p over xxhash64 shingle codes.
    One explode + one groupBy; min per permutation is a map-side
    combine-friendly aggregate."""
    p = 2305843009213693951  # 2^61 - 1 (Mersenne prime)
    # reduce the 64-bit shingle hash into 31 bits so (a*code + b) never
    # overflows a long for any permutation coefficient below
    sh = word_shingles(docs, n, text_col).withColumn(
        "code", F.pmod(F.xxhash64("shingle"), F.lit(2147483647))
    )
    perms = F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda i: F.pmod(
            (F.lit(1) + i * 2) * F.col("code") + (i * 2654435761 + 11),
            F.lit(p),
        ),
    )
    per_perm = sh.select(
        "doc_id", F.posexplode(perms).alias("perm", "h")
    )
    sig = (
        per_perm.groupBy("doc_id", "perm")
        .agg(F.min("h").alias("mh"))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("perm", "mh"))).alias("s"))
        .select(
            "doc_id",
            F.transform(F.col("s"), lambda x: x["mh"]).alias("sig"),
        )
    )
    return sig


def minhash_lsh_pairs(
    docs: DataFrame,
    num_perm: int = 32,
    bands: int = 8,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Banded LSH: band-signature equi-join finds candidates, estimated
    Jaccard = fraction of matching minhashes."""
    rows = num_perm // bands
    sig = minhash_signatures(docs, num_perm, n, text_col)
    banded = sig.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.hash(F.slice("sig", b * rows + 1, rows), b),
            )
        ).alias("band", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.round(
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        )
        / F.lit(num_perm),
        4,
    )
    return cand.select("doc_a", "doc_b", est.alias("est_jaccard"))


# ---------------------------------------------------------------- SimHash
def simhash(docs: DataFrame, bits: int = 64, text_col: str = "text") -> DataFrame:
    """64-bit SimHash, all JVM-side: explode tokens → xxhash64 → 64
    per-bit vote sums in a single groupBy (map-side combine) → sign bits
    reassembled with bitwise ors."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sh = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        sh = term if sh is None else sh.bitwiseOR(term)
    return agg.select("doc_id", sh.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 8,
                  text_col: str = "text") -> DataFrame:
    """Near-dup candidates by SimHash: block on 4 16-bit chunks (a pair
    within hamming ≤ max_hamming shares at least one exact chunk for
    max_hamming < 4 chunks by pigeonhole), then exact hamming filter."""
    sh = simhash(docs, 64, text_col)
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", 16 * c).bitwiseAND(F.lit(0xFFFF))
                    for c in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )
