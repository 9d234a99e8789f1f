"""Second advanced-coverage batch (round 5, session 4): corpus-quality
repetition filtering (the Gopher/C4 intra-document duplicate-n-gram
rule), data-mixture reweighting, robust (median/MAD) outlier detection,
bounded-tap exponential smoothing, blocked fuzzy string joins,
equi-depth histograms, unrolled PageRank, and seasonal anomaly scoring.

Design rules are the catalog's usual ones: every plan is keyed
equi-join / groupBy work (the only fanouts are explicitly bounded —
20 taps for EWMA, items-per-order for the co-occurrence graph, block
size for the fuzzy join), double aggregation goes through decimal
quantization so DuckDB reproduces bit-exact values, and randomness is
md5-derived. No reference analog: the reference app (a single-thread
requests/psycopg loop, /root/reference/app/main.py) has no analytics
surface; these rows extend SURVEY.md §2.5's "not present" families.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from airquality_data_pipeline_spark.functions.expr import let, materialize
from airquality_data_pipeline_spark.operators.dedup import shingle_array
from airquality_data_pipeline_spark.queries.common import (
    dec,
    table,
    utc,
)
from airquality_data_pipeline_spark.queries.registry import register


# --------------------------------------------------------------------------
# q143: intra-document repetition filter — the Gopher quality rule
# "fraction of duplicate word n-grams within the document" (n=5 here).
# Everything happens inside the row (split -> shingle -> distinct), so
# the plan is a single scan projection: no explode, no shuffle, and at
# 100 TB it's embarrassingly parallel. The fixture corpus has no
# natural repetition, so every 7th doc gets a planted self-doubled twin
# under a shifted id — those must be the flagged rows.
# The flag threshold (20% duplicated grams) is evaluated in integer
# arithmetic (dup*5 >= total) so no float comparison sits on the
# decision boundary.
# --------------------------------------------------------------------------
@register(
    "q143_repetition_filter",
    oracle=r"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 200000 AS doc_id, text || ' ' || text AS text
      FROM documents WHERE doc_id % 7 = 0
    ),
    g AS (
      SELECT doc_id,
             list_transform(
               generate_series(1, greatest(len(t) - 4, 0)),
               i -> array_to_string(t[i:i+4], ' ')) AS grams
      FROM (SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS t
            FROM corpus)
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
           round(CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
                 / len(grams), 6) AS dup_frac,
           (len(grams) - len(list_distinct(grams))) * 5 >= len(grams)
             AS flagged
    FROM g WHERE len(grams) > 0
    """,
)
def q143_repetition_filter(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.where(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.concat_ws(" ", "text", "text").alias("text"),
        )
    )
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    # one tokenize + one shingle build per row, counts taken inside the
    # same let body (two separate output columns would re-inline the
    # shingle subtree — see functions/expr.py)
    stats = let(
        toks,
        lambda w: let(
            shingle_array(w, 5),
            lambda g: F.struct(
                F.size(g).cast("long").alias("n_grams"),
                F.size(F.array_distinct(g)).cast("long").alias("n_distinct"),
            ),
        ),
    )
    m = materialize(corpus, ["doc_id"], stats, "s")
    total, dist = F.col("s.n_grams"), F.col("s.n_distinct")
    return m.where(total > 0).select(
        "doc_id",
        total.alias("n_grams"),
        dist.alias("n_distinct"),
        F.round((total - dist).cast("double") / total, 6).alias("dup_frac"),
        ((total - dist) * 5 >= total).alias("flagged"),
    )


# --------------------------------------------------------------------------
# q144: domain-mixture reweighting — given the per-source token mass,
# compute the sampling weight that moves the mixture toward a uniform
# target share (capped at 3x upsampling, the standard guard against
# over-replicating a tiny domain; cf. DoReMi-style mixture tuning's
# static baseline). Two tiny aggregates over a handful of source rows;
# the token-count scan is the only real work, so at 100 TB the cost is
# one pass over `documents`. Weight arithmetic is double with identical
# expression trees on both engines; the re-normalized share divides two
# exact BIGINTs.
# --------------------------------------------------------------------------
@register(
    "q144_mixture_reweight",
    oracle=r"""
    WITH per_source AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN len(trim(text)) = 0 THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+'))
                      END) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT *,
             round(CAST(n_tokens AS DOUBLE)
                   / SUM(n_tokens) OVER (), 6) AS token_share,
             round(least(
               (1.0 / COUNT(*) OVER ())
               / (CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER ()),
               3.0), 6) AS weight
      FROM per_source
    ),
    e AS (
      SELECT *, CAST(round(weight * n_tokens) AS BIGINT)
                  AS expected_tokens
      FROM w
    )
    SELECT source, n_docs, n_tokens, token_share, weight, expected_tokens,
           round(CAST(expected_tokens AS DOUBLE)
                 / SUM(expected_tokens) OVER (), 6) AS new_share
    FROM e
    """,
)
def q144_mixture_reweight(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    ws_tokens = F.when(
        F.length(F.trim("text")) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim("text"), r"\s+")))
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ws_tokens).cast("long").alias("n_tokens"),
    )
    everything = W.partitionBy()
    share = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(
        everything
    )
    target = F.lit(1.0) / F.count(F.lit(1)).over(everything)
    w = per_source.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("token_share"),
        F.round(F.least(target / share, F.lit(3.0)), 6).alias("weight"),
    ).withColumn(
        "expected_tokens",
        F.round(F.col("weight") * F.col("n_tokens"), 0).cast("long"),
    )
    return w.withColumn(
        "new_share",
        F.round(
            F.col("expected_tokens").cast("double")
            / F.sum("expected_tokens").over(everything),
            6,
        ),
    )


# --------------------------------------------------------------------------
# q145: robust outlier detection (median/MAD) — the z-score's
# outlier-resistant sibling: flag |0.6745 (x - med)| > 3.5 MAD
# (Iglewicz-Hosteller modified z-score). Exact medians via two grouped
# passes; the group medians (5 rows) broadcast back onto the fact scan,
# so the events table shuffles only for its own groupBy. The outlier
# predicate is the multiplication form (no division), so mad == 0
# degrades safely and both engines evaluate the identical IEEE tree.
# --------------------------------------------------------------------------
@register(
    "q145_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY 1
    ),
    mad AS (
      SELECT e.event_type, m.med,
             median(abs(e.value - m.med)) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY 1, 2
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(x.med, 6) AS med_r,
           round(x.mad, 6) AS mad_r,
           CAST(SUM(CASE WHEN 0.6745 * abs(e.value - x.med) > 3.5 * x.mad
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(max(0.6745 * abs(e.value - x.med)) / x.mad, 6)
             AS max_abs_z
    FROM events e JOIN mad x USING (event_type)
    GROUP BY e.event_type, x.med, x.mad
    """,
)
def q145_mad_outliers(spark, sf_dir):
    utc(spark)
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    j = ev.join(F.broadcast(med), "event_type")
    mad = j.groupBy("event_type", "med").agg(
        F.median(F.abs(F.col("value") - F.col("med"))).alias("mad")
    )
    j2 = ev.join(F.broadcast(mad), "event_type")
    dev = 0.6745 * F.abs(F.col("value") - F.col("med"))
    return j2.groupBy("event_type", "med", "mad").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(dev > 3.5 * F.col("mad"), 1).otherwise(0))
        .cast("long")
        .alias("n_outliers"),
        F.round(F.max(dev) / F.col("mad"), 6).alias("max_abs_z"),
    ).select(
        "event_type",
        "n",
        F.round("med", 6).alias("med_r"),
        F.round("mad", 6).alias("mad_r"),
        "n_outliers",
        "max_abs_z",
    )


# --------------------------------------------------------------------------
# q146: exponential moving average per user — EWMA with decay 1/2,
# truncated at 20 taps (weight 2^-19 ~ 1.9e-6; the tail is noise).
# The recursive definition is re-expressed as a BOUNDED-LAG self-join:
# each row joins its last 20 predecessors on the (user, row_number)
# equi-key, so the fanout is exactly 20x and the shuffle key is the
# user — the streaming-state-free batch shape that scales linearly.
# Weights are the INTEGER ladder 2^(19-d) (the 2^-d decay scaled by
# 2^19), so numerator and denominator are exact decimal/bigint sums
# in both engines — fractional powers of two would create exact
# decimal ties whose double->decimal rounding DuckDB and Spark break
# differently (measured: 12 last-digit flips at sf0.01).
# --------------------------------------------------------------------------
@register(
    "q146_ewma",
    oracle="""
    WITH r AS (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    p AS (
      SELECT a.user_id, a.rn,
             CAST(b.value AS DECIMAL(18,2)) AS v,
             CAST(pow(2, 19 - (a.rn - b.rn)) AS BIGINT) AS u
      FROM r a JOIN r b
        ON a.user_id = b.user_id
       AND b.rn BETWEEN a.rn - 19 AND a.rn
    )
    SELECT user_id, CAST(rn AS BIGINT) AS rn,
           round(CAST(CAST(SUM(v * u) AS VARCHAR) AS DOUBLE)
                 / CAST(SUM(u) AS DOUBLE), 6) AS ewma
    FROM p GROUP BY user_id, rn
    """,
)
def q146_ewma(spark, sf_dir):
    utc(spark)
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    r = ev.select(
        "user_id",
        "value",
        F.row_number()
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
    )
    # fan each row out to the 20 (user, rn) keys it contributes to,
    # then equi-join — Catalyst gets a plain shuffled hash join on
    # (user_id, rn) instead of a range-condition join
    a = r.select(
        "user_id",
        F.col("rn").alias("arn"),
    ).withColumn("d", F.explode(F.sequence(F.lit(0), F.lit(19))))
    b = r.select(
        F.col("user_id").alias("b_user"),
        F.col("rn").alias("brn"),
        "value",
    )
    pairs = a.join(
        b,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("brn") == F.col("arn") - F.col("d")),
    )
    u = F.pow(F.lit(2), F.lit(19) - F.col("d")).cast("long")
    return (
        pairs.groupBy("user_id", F.col("arn").alias("rn"))
        .agg(
            (
                F.sum(dec("value", 2) * u).cast("double")
                / F.sum(u).cast("double")
            ).alias("_e")
        )
        .select(
            "user_id",
            F.col("rn").cast("long").alias("rn"),
            F.round("_e", 6).alias("ewma"),
        )
    )
