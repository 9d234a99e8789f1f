"""Null-axis regression: the driver fixture has ZERO nulls, so every
null-handling defect is invisible to the standard parity suite.  Two
r10 sweep axes (tests/robustness/gen_alt_fixture.py) close the class:

``null_text`` puts NULLs in the corpus columns (documents.text/lang/
n_chars, embeddings.embedding) and caught NINETEEN defects in one
pass: DuckDB's list_inner_product ERRORS on a NULL vector instead of
returning NULL (the whole ANN/IVF/PQ family — 13 queries), DuckDB's
split_part returns '' for NULL input where Spark propagates NULL
(q19), null length/difficulty groups sitting at opposite ends of
cume_dist / cumulative-share / ECDF / curriculum windows (q105, q111,
q175, q217), and the Arrow multimodal operators dropping null
payloads the oracle kept (q133).  Convention: rows with no measurable
payload/vector/length are excluded at the source on BOTH engines;
q19 instead keeps rows and pins NULL-in -> NULL-out explicitly.

``null_mass`` puts 20-30% NULLs in the generic metric columns
(events.value, c_acctbal, o_totalprice, s_acctbal) and caught EIGHT
cross-engine defects in one pass, all in the rank/ordering family:

- q38/q185: a struct with a NULL field sorts LOWEST in Spark's
  struct-min/max but HIGHEST in DuckDB's, so an unguarded
  argmax-via-struct picks a null-scored row on exactly one engine;
- q64: Spark's default ASC null position is NULLS FIRST, DuckDB's is
  NULLS LAST — ntile/percent_rank/cume_dist over a nullable sort key
  silently shift (fixed with an explicit NULLS LAST on both);
- q190/q259/q260/q262: running sums / decile edges over a nullable
  score place the NULL group at opposite ends of the window;
- q196: the two-phase global rank's equi-join on the score column
  silently DROPS null keys on the Spark side only (7 deciles vs 10).

Fix convention, applied to Spark and oracle as a pair: a NULL score
carries no rank information — such rows are excluded at the source
(q64 instead keeps them under an explicit shared NULLS LAST, since its
output IS the ranked row set).  This suite pins the class on the exact
sweep fixture shape so it can't regress without the sweep.
"""
from __future__ import annotations

import pytest

from airquality_data_pipeline_spark.queries import ORACLE, QUERIES
from tests.oracle_utils import compare
from tests.robustness.gen_alt_fixture import generate

QUERY_NAMES = [
    "q38_argmax",
    "q64_ranking_extras",
    "q185_weighted_median",
    "q190_roc_auc",
    "q196_decile_lift",
    "q259_psi_drift",
    "q260_conformal_calibration",
    "q262_woe_iv",
]


@pytest.fixture(scope="module")
def null_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("null_mass"))
    generate(out, seed=13, scale=1.0, axis="null_mass")
    return out


@pytest.fixture(scope="module")
def null_duck(null_dir):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{null_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def test_nulls_actually_present(null_dir):
    """The axis must put NULLs in the columns the queries rank by —
    otherwise the parity assertions below prove nothing."""
    import pyarrow.parquet as pq

    for tab, col in [
        ("events", "value"),
        ("orders", "o_totalprice"),
        ("customer", "c_acctbal"),
    ]:
        t = pq.read_table(f"{null_dir}/{tab}.parquet")
        assert t.column(col).null_count > 0, (tab, col)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_null_mass_parity(name, spark, null_dir, null_duck):
    df = QUERIES[name](spark, null_dir)
    problems = compare(df, null_duck, ORACLE[name])
    assert not problems, problems


NULL_TEXT_QUERIES = [
    # ANN / IVF / PQ family: DuckDB list_inner_product NULL-vector error
    "q44_cosine_topk",
    "q45_embedding_neardup",
    "q46_ivf_topk",
    "q47_vector_lsh",
    "q104_kmeans_refine",
    "q107_ivf_multiprobe",
    "q115_ann_recall",
    "q116_product_quantization",
    "q130_semdedup",
    "q159_semantic_decontamination",
    "q172_knn_label_noise",
    "q218_matryoshka_recall",
    "q224_negative_sampling",
    # text/length windows + engine-asymmetric string/null handling
    "q19_string_funcs",
    "q105_length_filter",
    "q111_length_histogram",
    "q133_multimodal_frames",
    "q175_ks_test",
    "q217_curriculum_interleave",
]


@pytest.fixture(scope="module")
def null_text_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("null_text"))
    generate(out, seed=13, scale=1.0, axis="null_text")
    return out


@pytest.fixture(scope="module")
def null_text_duck(null_text_dir):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{null_text_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def test_corpus_nulls_actually_present(null_text_dir):
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{null_text_dir}/documents.parquet")
    emb = pq.read_table(f"{null_text_dir}/embeddings.parquet")
    for col in ("text", "lang", "n_chars"):
        assert docs.column(col).null_count > 0, col
    assert emb.column("embedding").null_count > 0


@pytest.mark.parametrize("name", NULL_TEXT_QUERIES)
def test_null_text_parity(name, spark, null_text_dir, null_text_duck):
    df = QUERIES[name](spark, null_text_dir)
    problems = compare(df, null_text_duck, ORACLE[name])
    assert not problems, problems


@pytest.fixture(scope="module")
def null_dir_x10(tmp_path_factory):
    """q165's defect needs a customer whose EVERY order is null-priced
    (revenue NULL -> Gini rank nulls-first vs nulls-last); that shape
    only appears at x10 of the axis fixture (the sweep's catch)."""
    out = str(tmp_path_factory.mktemp("null_mass_x10"))
    generate(out, seed=13, scale=10.0, axis="null_mass")
    return out


def test_all_null_revenue_customer_present(null_dir_x10):
    import duckdb

    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM (SELECT o_custkey FROM "
        f"'{null_dir_x10}/orders.parquet' GROUP BY o_custkey "
        f"HAVING count(o_totalprice) = 0)"
    ).fetchone()[0]
    con.close()
    assert n > 0, "fixture lost the all-null-revenue customer shape"


def test_null_mass_gini_parity_x10(spark, null_dir_x10):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"'{null_dir_x10}/orders.parquet'"
    )
    name = "q165_revenue_concentration"
    problems = compare(
        QUERIES[name](spark, null_dir_x10), con, ORACLE[name]
    )
    con.close()
    assert not problems, problems


def test_null_rows_excluded_not_binned(spark, null_dir):
    """q196 must produce the full 10 deciles over the SCORED rows only
    (before the fix the Spark side lost the null-key rows in its
    rank join and topped out at 7 deciles)."""
    rows = QUERIES["q196_decile_lift"](spark, null_dir).collect()
    assert sorted(r.decile for r in rows) == list(range(1, 11))
    import pyarrow.parquet as pq

    t = pq.read_table(f"{null_dir}/events.parquet")
    scored = t.num_rows - t.column("value").null_count
    assert sum(r.n for r in rows) == scored
