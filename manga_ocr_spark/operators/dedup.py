"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (the point of each operator at 100 TB):

- **exact**: one shuffle on a 32-byte fingerprint — the cheapest possible
  grouping key; map-side partial aggregation applies.
- **MinHash+LSH**: signatures are computed map-side (no shuffle); the only
  shuffle is the band-bucket groupBy, whose keys are small longs. Candidate
  pairs are generated per-bucket, so the cross product never materializes
  globally — this is what makes near-dedup feasible at 10^12 docs where a
  naive pairwise join (10^24 pairs) cannot exist.
- **SimHash**: 64-bit signature per doc via one Arrow-batched pandas UDF;
  near-dup candidates = equal signature (or banded prefixes), again a
  cheap long-key shuffle.
- **n-gram Jaccard**: exact verification for candidate pairs — used
  *after* LSH banding at scale; the standalone pairwise form here is for
  small refinement sets and oracle checking.

Hashes are built from md5 (portable: DuckDB computes the identical value,
so the driver's value-hash oracle can verify MinHash end-to-end — no
engine-specific hash function leaks into results).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from manga_ocr_spark.operators.text import fingerprint

# -- exact ---------------------------------------------------------------


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group by content fingerprint; keep the min id as canonical.

    Returns (fingerprint, canonical_id, n_copies) for every group.
    """
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per distinct content (the min-id row)."""
    w = df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint"))
    keep = w.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    return df.join(keep, id_col, "left_semi")


# -- shingles + portable hashing ------------------------------------------


def char_shingles(col: Column, n: int = 5) -> Column:
    """Distinct character n-grams of the canonicalized text, as an array.

    Pure SQL expression: transform over a sequence of offsets. Stays in
    codegen; no UDF.
    """
    canon = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    m = F.greatest(F.length(canon) - F.lit(n - 1), F.lit(1))
    grams = F.transform(F.sequence(F.lit(1), m), lambda i: F.substring(canon, i, n))
    return F.array_distinct(grams)


def _md5_long(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative long — portable across
    engines (DuckDB: ('0x' || substr(md5(x),1,15))::ubigint)."""
    return F.conv(F.substring(F.md5(F.encode(col, "UTF-8")), 1, 15), 16, 10).cast("long")


def minhash_signature(col: Column, num_hashes: int = 16) -> Column:
    """MinHash signature as array<long> of length ``num_hashes``.

    h_i(gram) = md5_long(i || ':' || gram); signature[i] = min over grams.
    All map-side; the per-row cost is num_hashes x |shingles| hash calls
    inside codegen.
    """
    grams = char_shingles(col)

    def _min_hash(seed: int):
        prefix = f"{seed}:"
        # NB: the lambda must take exactly ONE parameter — pyspark treats a
        # two-parameter transform lambda as (element, index)
        return F.array_min(F.transform(grams, lambda g: _md5_long(F.concat(F.lit(prefix), g))))

    return F.array(*[_min_hash(i) for i in range(num_hashes)])


def minhash_lsh_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Docs -> (band, band_key, id) bucket assignments.

    Two docs are near-dup *candidates* iff they share (band, band_key) for
    any band. rows_per_band = num_hashes / bands.
    """
    rows = num_hashes // bands
    sig = minhash_signature(F.col(text_col), num_hashes)
    # Build all band structs inside ONE expression that references the
    # signature exactly once. Referencing `sig` from N separate column
    # expressions would let Catalyst's project-collapse inline the whole
    # 16-hash tree N times — catastrophic codegen blowup (measured 100x
    # slowdown at 16 references).
    bands_expr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.md5(
                F.array_join(
                    F.transform(F.slice(sig, b * rows + 1, rows), lambda x: x.cast("string")),
                    ",",
                )
            ).alias("band_key"),
        ),
    )
    return df.select(F.col(id_col), F.explode(bands_expr).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )


def minhash_candidate_pairs(buckets: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Self-join bucket assignments -> distinct candidate (id_a < id_b) pairs.

    The join key (band, band_key) keeps the blow-up local to buckets.
    """
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


# -- n-gram Jaccard ---------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """All-pairs n-gram Jaccard >= threshold (id_a < id_b).

    O(N^2): refinement/verification step — at scale, feed it LSH candidate
    pairs instead of the full cross join (see minhash_candidate_pairs).
    """
    g = df.select(F.col(id_col), char_shingles(F.col(text_col), n).alias("grams"))
    a, b = g.alias("a"), g.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.array_union(F.col("a.grams"), F.col("b.grams")))
    jac = F.round(inter / F.greatest(union, F.lit(1)), 6)
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# -- SimHash ------------------------------------------------------------------


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc via an Arrow-batched pandas UDF.

    Token hashes come from md5 (stable everywhere); bit-vote accumulation is
    vectorized numpy over the batch. Near-dups = small Hamming distance;
    equal-signature grouping is the degenerate (fast) case.
    """
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        import hashlib

        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if not t:
                continue
            votes = np.zeros(64, dtype=np.int64)
            for tok in str(t).lower().split():
                h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
                bits = np.unpackbits(
                    np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8)
                ).astype(np.int64)
                votes += bits * 2 - 1
            sig = np.uint64(0)
            for bit, v in enumerate(votes):
                if v > 0:
                    sig |= np.uint64(1) << np.uint64(63 - bit)
            out[i] = np.int64(sig)
        return pd.Series(out)

    return df.select(F.col(id_col), _simhash(F.col(text_col)).alias("simhash"))
