"""Text-analysis queries over the documents corpus: language ID, quality
scoring, token counting, fingerprinting, and binary-column plumbing.
North-star operator family (BASELINE.json §north_star).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airquality_data_pipeline_spark.operators.text import (
    LANG_MARKERS,
    boilerplate_ngram_stats,
    fingerprint,
    language_id,
    ngram_contamination,
    quality_features,
    repetition_features,
    term_stats,
    tfidf_vectors,
    token_counts,
)
from airquality_data_pipeline_spark.queries.common import table
from airquality_data_pipeline_spark.queries.registry import register

# DuckDB regexp_count equivalent: len(regexp_extract_all(...))
def _rc(expr: str, pattern: str) -> str:
    return f"len(regexp_extract_all({expr}, '{pattern}'))"


# --------------------------------------------------------------------------
# q48: heuristic language ID — per-language stopword-marker counts,
# argmax with fixed priority tiebreak ('und' when all zero).
# --------------------------------------------------------------------------
_LANG_SCORES_SQL = ",\n           ".join(
    f"{_rc('lower(text)', LANG_MARKERS[lang])} AS score_{lang}"
    for lang in ("en", "es", "de", "fr")
)

@register(
    "q48_language_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
           {_LANG_SCORES_SQL}
      FROM documents
    )
    SELECT doc_id, score_en, score_es, score_de, score_fr,
           CASE
             WHEN score_en > 0 AND score_en >= greatest(score_es, score_de, score_fr) THEN 'en'
             WHEN score_es > 0 AND score_es >= greatest(score_en, score_de, score_fr) THEN 'es'
             WHEN score_de > 0 AND score_de >= greatest(score_en, score_es, score_fr) THEN 'de'
             WHEN score_fr > 0 AND score_fr >= greatest(score_en, score_es, score_de) THEN 'fr'
             ELSE 'und'
           END AS pred_lang
    FROM scored
    """,
)
def q48_language_id(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return language_id(docs, text_col="text", id_col="doc_id")


# --------------------------------------------------------------------------
# q49: quality features + composite score (length, punctuation, digit,
# stopword ratios) — double arithmetic with a fixed expression tree.
# --------------------------------------------------------------------------
@register(
    "q49_quality_score",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             length(text) AS n_chars_calc,
             len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens,
             {_rc('text', '[.,;:!?]')} AS n_punct,
             {_rc('text', '[0-9]')} AS n_digit,
             {_rc('lower(text)', LANG_MARKERS['en'])} AS n_stop
      FROM documents
    )
    SELECT doc_id, n_chars_calc, n_tokens,
           CAST(n_chars_calc - (n_tokens - 1) AS DOUBLE)
             / CAST(greatest(n_tokens, 1) AS DOUBLE) AS avg_tok_len,
           CAST(n_punct AS DOUBLE) / CAST(greatest(n_chars_calc, 1) AS DOUBLE) AS punct_ratio,
           CAST(n_digit AS DOUBLE) / CAST(greatest(n_chars_calc, 1) AS DOUBLE) AS digit_ratio,
           CAST(n_stop AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE) AS stop_ratio,
           least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.4
             + least((CAST(n_stop AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE)) * 5.0, 1.0) * 0.3
             + (1.0 - least((CAST(n_punct AS DOUBLE) / CAST(greatest(n_chars_calc, 1) AS DOUBLE)) * 10.0, 1.0)) * 0.2
             + (1.0 - least((CAST(n_digit AS DOUBLE) / CAST(greatest(n_chars_calc, 1) AS DOUBLE)) * 10.0, 1.0)) * 0.1
             AS quality
    FROM m
    """,
)
def q49_quality_score(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return quality_features(docs, text_col="text", id_col="doc_id")


# --------------------------------------------------------------------------
# q50: token counting — whitespace tokens + BPE-ish subword proxy
# (alpha runs / single digits / single punctuation).
# --------------------------------------------------------------------------
_BPE_COUNT = _rc("lower(text)", "[a-z]+|[0-9]|[^a-z0-9\\s]")

@register(
    "q50_token_counts",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END AS ws_tokens,
           {_BPE_COUNT} AS bpe_ish_tokens
    FROM documents
    """,
)
def q50_token_counts(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return token_counts(docs, text_col="text", id_col="doc_id")


# --------------------------------------------------------------------------
# q51: order-insensitive document fingerprint (md5 of sorted distinct
# token set) + vocabulary size.
# --------------------------------------------------------------------------
@register(
    "q51_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
             string_split_regex(lower(trim(text)), '\\s+'))), ' ')) AS fingerprint,
           len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS vocab_size
    FROM documents
    """,
)
def q51_fingerprint(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return fingerprint(docs, text_col="text", id_col="doc_id")


# --------------------------------------------------------------------------
# q52: binary-column plumbing — text payload as an opaque binary column
# with byte length + digest (the multimodal column pattern; DuckDB lacks
# md5(BLOB) so the oracle digests the identical UTF-8 text directly).
# --------------------------------------------------------------------------
@register(
    "q52_binary_columns",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS digest,
           source AS modality_tag
    FROM documents
    """,
)
def q52_binary_columns(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("digest"),
        F.col("source").alias("modality_tag"),
    )


# --------------------------------------------------------------------------
# q54: corpus term statistics — the exact-integer substrate of TF-IDF
# (df / total tf / max tf per term).
# --------------------------------------------------------------------------
@register(
    "q54_term_stats",
    oracle="""
    WITH toks AS (
      SELECT doc_id AS id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ),
    tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY id, term)
    -- CAST: DuckDB SUM(BIGINT) -> HUGEINT (float64 in pandas) vs Spark int64
    SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf, max(tf) AS max_tf
    FROM tf GROUP BY term
    """,
)
def q54_term_stats(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return term_stats(docs, text_col="text", id_col="doc_id")


# --------------------------------------------------------------------------
# q62: smoothed TF-IDF weights (rows-only: log() is libm-dependent and
# not bit-portable across engines; q54 pins the integer substrate).
# --------------------------------------------------------------------------
@register("q62_tfidf")
def q62_tfidf(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return tfidf_vectors(docs, text_col="text", id_col="doc_id", min_df=2)


# --------------------------------------------------------------------------
# q95: within-document n-gram repetition filter — the Gopher-style
# repetition quality rule: total vs distinct word 3-grams per doc and
# the duplicate ratio, plus the keep/drop verdict at a 0.5 ratio.
# Pure per-row array arithmetic: zero shuffle at any scale.
# --------------------------------------------------------------------------
@register(
    "q95_repetition_filter",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN list_transform(range(1, len(w) - 1),
                                      i -> array_to_string(w[i:i+2], ' '))
                  ELSE [] END AS sh
      FROM t
    )
    SELECT doc_id,
           len(sh) AS n_ngrams,
           len(list_distinct(sh)) AS n_distinct_ngrams,
           CASE WHEN len(sh) > 0
                THEN round(1.0 - CAST(len(list_distinct(sh)) AS DOUBLE)
                                 / CAST(len(sh) AS DOUBLE), 6)
                ELSE 0.0 END AS dup_ratio,
           CASE WHEN len(sh) > 0
                THEN round(1.0 - CAST(len(list_distinct(sh)) AS DOUBLE)
                                 / CAST(len(sh) AS DOUBLE), 6)
                ELSE 0.0 END <= 0.5 AS keep
    FROM g
    """,
)
def q95_repetition_filter(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    feats = repetition_features(docs, text_col="text", id_col="doc_id", n=3)
    return feats.withColumn("keep", F.col("dup_ratio") <= 0.5)


# --------------------------------------------------------------------------
# q97: corpus-wide boilerplate n-grams — a 3-gram present in >= 10
# distinct documents is boilerplate (template/navigation text); each doc
# reports its contamination count + ratio (the C4/RefinedWeb shared-text
# removal signal at n-gram granularity).
# --------------------------------------------------------------------------
@register(
    "q97_boilerplate_ngrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id AS id, array_to_string(t[i:i+2], ' ') AS shingle
      FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 0))) AS g(i)
      WHERE len(t) >= 3
    ),
    dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
    SELECT id, count(*) AS n_shingles,
           CAST(SUM(CASE WHEN df >= 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boiler,
           round(CAST(SUM(CASE WHEN df >= 10 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS boiler_ratio
    FROM sh JOIN dfreq USING (shingle)
    GROUP BY id
    """,
)
def q97_boilerplate_ngrams(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return boilerplate_ngram_stats(
        docs, text_col="text", id_col="doc_id", n=3, min_df=10
    )


# --------------------------------------------------------------------------
# q99: benchmark decontamination — per TRAIN document (md5 bucket < 80,
# the q86 split), how many of its distinct 8-grams also occur in the
# held-out TEST split (bucket >= 90). The n-gram-collision test-set-leak
# check used when curating LLM corpora. Benchmark shingle set is small
# and broadcasts; train side aggregates without an extra shuffle.
# --------------------------------------------------------------------------
@register(
    "q99_decontamination",
    oracle="""
    WITH b AS (
      SELECT doc_id, text,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
               AS bucket
      FROM documents
    ),
    toks AS (
      SELECT doc_id, bucket,
             string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM b WHERE bucket < 80 OR bucket >= 90
    ),
    sh AS (
      SELECT DISTINCT doc_id, bucket,
             array_to_string(t[i:i+7], ' ') AS shingle
      FROM toks, UNNEST(generate_series(1, greatest(len(t) - 7, 0))) AS g(i)
      WHERE len(t) >= 8
    ),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE bucket >= 90),
    per_doc AS (
      SELECT s.doc_id,
             count(*) AS n_ngrams,
             CAST(SUM(CASE WHEN bench.shingle IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_contaminated
      FROM sh s LEFT JOIN bench USING (shingle)
      WHERE s.bucket < 80
      GROUP BY s.doc_id
    )
    SELECT b.doc_id AS id,
           CAST(coalesce(p.n_ngrams, 0) AS BIGINT) AS n_ngrams,
           CAST(coalesce(p.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           coalesce(p.n_contaminated, 0) > 0 AS contaminated
    FROM b LEFT JOIN per_doc p USING (doc_id)
    WHERE b.bucket < 80
    """,
)
def q99_decontamination(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    tagged = docs.withColumn("_bucket", bucket)
    train = tagged.where(F.col("_bucket") < 80)
    bench = tagged.where(F.col("_bucket") >= 90)
    return ngram_contamination(
        train, bench, text_col="text", id_col="doc_id", n=8
    )


# --------------------------------------------------------------------------
# q100: temperature-weighted language sampling — the multilingual
# corpus-balancing rule (sample language l proportional to p_l^alpha,
# alpha=0.3 upsamples the tail; cf. multilingual LM data recipes). Two
# tiny aggregates over a 5-row frame; the token-count scan is the only
# real work. Decimal quantization keeps the weight normalization
# order-independent and engine-exact.
# --------------------------------------------------------------------------
@register(
    "q100_language_sampling",
    oracle="""
    WITH per_lang AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN len(trim(text)) = 0 THEN 0
                      ELSE len(string_split_regex(trim(text), '\\s+'))
                      END) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    w AS (
      SELECT *,
             CAST(round(pow(CAST(n_tokens AS DOUBLE)
                            / SUM(CAST(n_tokens AS DOUBLE)) OVER (),
                            0.3), 6) AS DECIMAL(18,6)) AS pw
      FROM per_lang
    )
    SELECT lang, n_docs, n_tokens,
           round(CAST(pw AS DOUBLE)
                 / CAST(SUM(pw) OVER () AS DOUBLE), 6) AS sample_weight
    FROM w
    """,
)
def q100_language_sampling(spark, sf_dir):
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    ws = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )
    per_lang = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ws).cast("long").alias("n_tokens"),
    )
    everything = Window.partitionBy()
    p = F.col("n_tokens").cast("double") / F.sum(
        F.col("n_tokens").cast("double")
    ).over(everything)
    # round the power through decimal so the normalizing sum is exact
    # (order-independent) on both engines; divide as double at the end
    pw = F.round(F.pow(p, F.lit(0.3)), 6).cast("decimal(18,6)")
    return per_lang.withColumn("_pw", pw).select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("_pw").cast("double")
            / F.sum("_pw").over(everything).cast("double"),
            6,
        ).alias("sample_weight"),
    )
