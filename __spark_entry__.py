"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline over pages built
from the sf0.001 documents table. ``queries()``/``oracle_sql()`` pairs
cover the operator inventory of SURVEY.md §2 plus the training-data
operators (dedup / similarity / text analysis / multimodal), each checked
against a DuckDB oracle at sf0.01.

Column-name and value-rounding conventions are shared between the Spark
builders and the SQL strings so the driver's order-insensitive value-hash
matches (floats are rounded identically on both sides; sums of ints are
cast to BIGINT in DuckDB to avoid HUGEINT).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

from manga_ocr_spark.jobs.extract import extract_pages  # noqa: E402
from manga_ocr_spark.jobs.pages_from_docs import pages_from_documents  # noqa: E402
from manga_ocr_spark.operators import dedup as D  # noqa: E402
from manga_ocr_spark.operators import similarity as S  # noqa: E402
from manga_ocr_spark.operators import text as T  # noqa: E402
from manga_ocr_spark.operators.multimodal import media_features, media_meta  # noqa: E402

# whitespace-normalization applied by the extraction core to the plain-ASCII
# document texts — shared shape with the SQL oracles
_NORM_SQL = r"regexp_replace(trim(text), '\s+', ' ', 'g')"
_FP_SQL = r"md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: html-ify sf0.001 documents, run the full extraction engine."""
    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    pages = pages_from_documents(docs)
    return extract_pages(pages, salt_partitions=8).drop("ok")


# --------------------------------------------------------------------------
# query builders
# --------------------------------------------------------------------------


def _q_extract(family: int) -> Callable[[SparkSession, str], DataFrame]:
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == family)
        ext = extract_pages(pages_from_documents(docs))
        return ext.select("url", "extracted_text").orderBy("url")

    return q


def _q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def _q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def _q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


def _q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20) & (F.col("l_returnflag") == "R")
    ).select(
        "l_orderkey",
        "l_linenumber",
        # unrounded: the same left-associated IEEE product is bit-identical
        # on both engines; rounding would *introduce* half-tie divergence
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias(
            "charge"
        ),
    )


def _q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def _q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


def _q_window_package(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W1: fixed-size packaging of a corpus (process_cc100.py:43-69 analogue)
    w = Window.orderBy("doc_id")
    return (
        _t(spark, sf_dir, "documents")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("package", F.floor((F.col("rn") - 1) / 100).cast("long"))
        .groupBy("package")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


def _q_union_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    a = d.filter(F.col("source") == "src0")
    b = d.filter(F.col("source") == "src1")
    return (
        a.unionByName(b)
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("total_chars"))
    )


def _q_lang_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def _docs_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # testdata has no natural dups; synthesize a stable dup set: copies of
    # docs 0..49 under shifted ids (same text => same fingerprint)
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dups = d.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"), F.col("text")
    )
    return d.unionByName(dups)


def _q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dup_groups(_docs_with_dups(spark, sf_dir)).filter(F.col("n_copies") > 1)


def _q_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(_docs_with_dups(spark, sf_dir)).select("doc_id")


def _q_broadcast_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def _q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # O5/X8 resume shape: anti-join against a committed set
    o = _t(spark, sf_dir, "orders")
    committed = o.filter(F.col("o_orderkey") % 10 < 3).select("o_orderkey")
    return (
        o.join(committed, "o_orderkey", "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


def _q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


def _q_events_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        _t(spark, sf_dir, "events")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", "event_id", "event_type", "ts")
    )


def _q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(F.count("*").alias("n"), F.sum("k").alias("sum_k"))
    )


def _q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.withColumn("n_tokens", T.token_count(F.col("text")).cast("long"))
        .groupBy("lang")
        .agg(
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
    )


def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.token_count(F.col("text")).cast("long").alias("n_tokens"),
        T.stopword_ratio(F.col("text")).alias("stopword_ratio"),
        T.mean_token_len(F.col("text")).alias("mean_token_len"),
        T.alpha_ratio(F.col("text")).alias("alpha_ratio"),
    )


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", T.lang_id(F.col("text")).alias("lang_pred"))


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", T.fingerprint(F.col("text")).alias("fingerprint"))


def _q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return D.minhash_lsh_buckets(d)


def _q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_with_dups(spark, sf_dir).filter(
        (F.col("doc_id") < 50) | (F.col("doc_id") >= 100000)
    )
    return D.minhash_candidate_pairs(D.minhash_lsh_buckets(d))


def _q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs_with_dups(spark, sf_dir).filter(
        (F.col("doc_id") < 100) | (F.col("doc_id") >= 100000)
    )
    return D.ngram_jaccard_pairs(d, threshold=0.35)


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return D.simhash64(d)


def _q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return S.cosine_topk(q, e, k=5)


def _q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return S.lsh_bucket_topk(q, e, k=5, dim=64, bits=8)


def _media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"), F.encode(F.col("text"), "UTF-8").alias("payload")
    )


def _q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_meta(_media_df(spark, sf_dir))


def _q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_features(_media_df(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # flagship extraction (full engine, oracle = SQL normalization)
        "extract_plain": _q_extract(0),
        "extract_linkfarm": _q_extract(1),
        "extract_multiblock": _q_extract(2),
        # relational operator inventory (SURVEY §2)
        "q1_pricing_summary": _q1_pricing,
        "q3_top_revenue": _q3_top_revenue,
        "q5_region_revenue": _q5_region_revenue,
        "filter_project_lineitem": _q_filter_project,
        "topk_orders": _q_topk_orders,
        "window_rank_orders": _q_window_rank,
        "window_package_docs": _q_window_package,
        "union_sources": _q_union_sources,
        "agg_lang_mix": _q_lang_mix,
        "broadcast_join_brand": _q_broadcast_brand,
        "anti_join_resume": _q_anti_join,
        "events_hourly": _q_events_hourly,
        "events_latest_per_user": _q_events_latest,
        "events_json_props": _q_events_json,
        # training-data pipeline: dedup
        "dedup_exact_groups": _q_dedup_groups,
        "dedup_exact_keep": _q_dedup_keep,
        "minhash_lsh_buckets": _q_minhash,
        "minhash_candidate_pairs": _q_minhash_pairs,
        "ngram_jaccard_pairs": _q_jaccard,
        "simhash_docs": _q_simhash,
        # similarity search
        "cosine_topk": _q_cosine_topk,
        "ann_lsh_topk": _q_ann_lsh,
        # text analysis
        "token_stats": _q_token_stats,
        "quality_scores": _q_quality,
        "lang_id": _q_lang_id,
        "doc_fingerprints": _q_fingerprint,
        # multimodal plumbing
        "media_meta": _q_media_meta,
        "media_features": _q_media_features,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------


def _minhash_sql_parts(n_filter: str) -> tuple[str, str]:
    """Shared CTEs replicating operators/dedup.py minhash in DuckDB SQL."""
    hashes = ", ".join(
        f"list_min(list_transform(g, x -> (('0x' || substr(md5('{i}:' || x), 1, 15))::ubigint)::bigint))"
        for i in range(16)
    )
    ctes = f"""
with canon as (
  select doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') as c
  from documents where {n_filter}
), grams as (
  select doc_id,
         list_distinct(list_transform(range(1, greatest(length(c) - 4, 1) + 1),
                                      i -> substr(c, i::int, 5))) as g
  from canon
), sig as (
  select doc_id, [{hashes}] as s from grams
), buckets as (
  {" union all ".join(
      f"select doc_id, {b} as band, md5(concat_ws(',', s[{b*4+1}], s[{b*4+2}], s[{b*4+3}], s[{b*4+4}])) as band_key from sig"
      for b in range(4)
  )}
)"""
    return ctes, "buckets"


def oracle_sql() -> dict[str, str]:
    ext_plain = f"""
        select 'https://docs.example/' || doc_id as url,
               {_NORM_SQL} as extracted_text
        from documents where doc_id % 3 = 0 order by url"""
    ext_linkfarm = f"""
        select 'https://docs.example/' || doc_id as url,
               {_NORM_SQL} as extracted_text
        from documents where doc_id % 3 = 1 order by url"""
    ext_multiblock = f"""
        select 'https://docs.example/' || doc_id as url,
               {_NORM_SQL} || chr(10) || {_NORM_SQL} as extracted_text
        from documents where doc_id % 3 = 2 order by url"""

    dups_cte = """
with docs_dups as (
  select doc_id, text from documents
  union all
  select doc_id + 100000 as doc_id, text from documents where doc_id < 50
)"""

    mh_ctes, _ = _minhash_sql_parts("doc_id < 50")
    mh_pair_hashes = ", ".join(
        f"list_min(list_transform(g, x -> (('0x' || substr(md5('{i}:' || x), 1, 15))::ubigint)::bigint))"
        for i in range(16)
    )
    mh_pairs = f"""
with base as (
  select doc_id, text from documents where doc_id < 50
  union all
  select doc_id + 100000 as doc_id, text from documents where doc_id < 50
), canon as (
  select doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') as c from base
), grams as (
  select doc_id,
         list_distinct(list_transform(range(1, greatest(length(c) - 4, 1) + 1),
                                      i -> substr(c, i::int, 5))) as g
  from canon
), sig as (
  select doc_id, [{mh_pair_hashes}] as s from grams
), buckets as (
  {" union all ".join(
      f"select doc_id, {b} as band, md5(concat_ws(',', s[{b*4+1}], s[{b*4+2}], s[{b*4+3}], s[{b*4+4}])) as band_key from sig"
      for b in range(4)
  )}
)
select distinct a.doc_id as id_a, b.doc_id as id_b
from buckets a join buckets b
  on a.band = b.band and a.band_key = b.band_key and a.doc_id < b.doc_id"""

    stop_list = ", ".join(f"'{w}'" for w in T.STOPWORDS)
    toks = r"regexp_split_to_array(trim(text), '\s+')"

    def _marker(words: tuple[str, ...]) -> str:
        pat = r"\b(" + "|".join(words) + r")\b"
        return f"len(regexp_extract_all(lower(text), '{pat}'))"

    c = {lang: _marker(ws) for lang, ws in T.LANG_MARKERS.items()}
    lang_case = f"""
        case
          when {c['en']} > 0 and {c['en']} >= {c['de']} and {c['en']} >= {c['fr']} and {c['en']} >= {c['es']} then 'en'
          when {c['de']} > 0 and {c['de']} >= {c['fr']} and {c['de']} >= {c['es']} then 'de'
          when {c['fr']} > 0 and {c['fr']} >= {c['es']} then 'fr'
          when {c['es']} > 0 then 'es'
          else 'und'
        end"""

    shingle5 = (
        "list_distinct(list_transform("
        "range(1, greatest(length(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) - 4, 1) + 1), "
        "i -> substr(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), i::int, 5)))"
    )

    return {
        "extract_plain": ext_plain,
        "extract_linkfarm": ext_linkfarm,
        "extract_multiblock": ext_multiblock,
        "q1_pricing_summary": """
            select l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) as sum_qty,
                   round(sum(l_extendedprice), 2) as sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_disc_price,
                   round(avg(l_quantity), 4) as avg_qty,
                   round(avg(l_discount), 4) as avg_disc,
                   count(*)::bigint as count_order
            from lineitem
            where l_shipdate <= timestamp '1998-09-01'
            group by l_returnflag, l_linestatus""",
        "q3_top_revenue": """
            select o.o_orderkey, o.o_orderdate,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) as revenue
            from lineitem l
            join orders o on l.l_orderkey = o.o_orderkey
            join customer c on o.o_custkey = c.c_custkey
            where c.c_mktsegment = 'BUILDING'
              and o.o_orderdate < timestamp '1998-01-01'
            group by o.o_orderkey, o.o_orderdate
            order by revenue desc, o.o_orderkey asc
            limit 10""",
        "q5_region_revenue": """
            select n.n_name,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) as revenue
            from lineitem l
            join orders o on l.l_orderkey = o.o_orderkey
            join customer c on o.o_custkey = c.c_custkey
            join supplier s on l.l_suppkey = s.s_suppkey and c.c_nationkey = s.s_nationkey
            join nation n on c.c_nationkey = n.n_nationkey
            join region r on n.n_regionkey = r.r_regionkey
            where r.r_name = 'ASIA'
            group by n.n_name""",
        "filter_project_lineitem": """
            select l_orderkey, l_linenumber,
                   l_extendedprice * (1 - l_discount) * (1 + l_tax) as charge
            from lineitem
            where l_quantity >= 10 and l_quantity <= 20 and l_returnflag = 'R'""",
        "topk_orders": """
            select o_orderkey, o_custkey, o_totalprice
            from orders
            order by o_totalprice desc, o_orderkey asc
            limit 10""",
        "window_rank_orders": """
            select o_custkey, o_orderkey, o_totalprice, rk from (
              select o_custkey, o_orderkey, o_totalprice,
                     row_number() over (partition by o_custkey
                                        order by o_totalprice desc, o_orderkey asc) as rk
              from orders
            ) where rk <= 3""",
        "window_package_docs": """
            select package, count(*)::bigint as n_docs,
                   min(doc_id) as min_id, max(doc_id) as max_id
            from (
              select doc_id,
                     ((row_number() over (order by doc_id)) - 1) // 100 as package
              from documents
            )
            group by package""",
        "union_sources": """
            select source, count(*)::bigint as n, sum(n_chars)::bigint as total_chars
            from (
              select * from documents where source = 'src0'
              union all
              select * from documents where source = 'src1'
            )
            group by source""",
        "agg_lang_mix": """
            select lang, count(*)::bigint as n,
                   round(avg(n_chars), 4) as avg_chars,
                   sum(n_chars)::bigint as total_chars
            from documents group by lang""",
        "broadcast_join_brand": """
            select p.p_brand,
                   round(sum(l.l_extendedprice), 2) as revenue,
                   count(*)::bigint as n_items
            from lineitem l join part p on l.l_partkey = p.p_partkey
            group by p.p_brand""",
        "anti_join_resume": """
            select o_orderstatus, count(*)::bigint as n
            from orders
            where o_orderkey not in (
              select o_orderkey from orders where o_orderkey % 10 < 3
            )
            group by o_orderstatus""",
        "events_hourly": """
            select date_trunc('hour', ts) as hour, event_type,
                   count(*)::bigint as n, round(sum(value), 4) as total_value
            from events group by 1, 2""",
        "events_latest_per_user": """
            select user_id, event_id, event_type, ts from (
              select user_id, event_id, event_type, ts,
                     row_number() over (partition by user_id
                                        order by ts desc, event_id desc) as rk
              from events
            ) where rk = 1""",
        "events_json_props": """
            select (json_extract_string(props, '$.k')::int) % 10 as k_mod,
                   count(*)::bigint as n,
                   sum(json_extract_string(props, '$.k')::int)::bigint as sum_k
            from events group by 1""",
        "dedup_exact_groups": dups_cte
        + f"""
            select {_FP_SQL.replace('text', 'text')} as fingerprint,
                   min(doc_id) as canonical_id,
                   count(*)::bigint as n_copies
            from docs_dups
            group by 1
            having count(*) > 1""",
        "dedup_exact_keep": dups_cte
        + f"""
            select doc_id from docs_dups
            where doc_id in (
              select min(doc_id) from docs_dups group by {_FP_SQL}
            )""",
        "minhash_lsh_buckets": mh_ctes + "\nselect doc_id, band, band_key from buckets",
        "minhash_candidate_pairs": mh_pairs,
        "ngram_jaccard_pairs": f"""
            with base as (
              select doc_id, text from documents where doc_id < 100
              union all
              select doc_id + 100000 as doc_id, text from documents where doc_id < 50
            ), g as (
              select doc_id, {shingle5} as grams
              from base
            )
            select a.doc_id as id_a, b.doc_id as id_b,
                   round(len(list_intersect(a.grams, b.grams))::double
                         / greatest(len(list_distinct(list_concat(a.grams, b.grams))), 1), 6)
                     as jaccard
            from g a join g b on a.doc_id < b.doc_id
            where round(len(list_intersect(a.grams, b.grams))::double
                        / greatest(len(list_distinct(list_concat(a.grams, b.grams))), 1), 6)
                  >= 0.35""",
        "cosine_topk": """
            with v as (select vec_id, embedding::double[] as e from embeddings),
            pairs as (
              select q.vec_id as query_id, c.vec_id as neighbor_id,
                     round(
                       list_sum(list_transform(range(1, 65), i -> q.e[i::int] * c.e[i::int]))
                       / (sqrt(list_sum(list_transform(range(1, 65), i -> q.e[i::int] * q.e[i::int])))
                          * sqrt(list_sum(list_transform(range(1, 65), i -> c.e[i::int] * c.e[i::int])))),
                       6) as cos
              from v q join v c on q.vec_id < 5 and q.vec_id != c.vec_id
            )
            select query_id, neighbor_id, cos, rank from (
              select query_id, neighbor_id, cos,
                     row_number() over (partition by query_id
                                        order by cos desc, neighbor_id asc) as rank
              from pairs
            ) where rank <= 5""",
        "token_stats": f"""
            select lang,
                   sum(len({toks}))::bigint as total_tokens,
                   round(avg(len({toks})), 4) as avg_tokens
            from documents group by lang""",
        "quality_scores": f"""
            select doc_id,
                   len({toks})::bigint as n_tokens,
                   round(len(list_filter({toks}, t -> t in ({stop_list})))::double
                         / greatest(len({toks}), 1), 6) as stopword_ratio,
                   round(list_sum(list_transform({toks}, t -> length(t)))::double
                         / greatest(len({toks}), 1), 6) as mean_token_len,
                   round(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))::double
                         / greatest(length(text), 1), 6) as alpha_ratio
            from documents""",
        "lang_id": f"select doc_id, {lang_case} as lang_pred from documents",
        "doc_fingerprints": f"select doc_id, {_FP_SQL} as fingerprint from documents",
        "media_meta": """
            select doc_id as media_id,
                   octet_length(encode(text))::bigint as n_bytes,
                   md5(text) as content_md5
            from documents""",
        # rows-only checks (non-SQL-expressible or stubbed kernels):
        #   simhash_docs (bit-vote accumulation), ann_lsh_topk (approximate
        #   recall by construction), media_features (stubbed codec)
    }
