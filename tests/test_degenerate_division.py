"""Degenerate-denominator regression: statistics queries whose test
statistic divides by a variance-like quantity must return NULL — not
throw — when the data makes that quantity zero, and the NULL must agree
with the DuckDB oracle (whose ``x / 0`` is NULL, vs ANSI Spark's ``/``
which raises DIVIDE_BY_ZERO).

Found by the alt-seed robustness sweep (tests/robustness/run_sweep.py):
a seed-13 half-scale fixture produced a constant hourly series and blew
up q166. This fixture engineers every such degeneracy at once:

- every event-type pair's hourly volume series is constant except pairs
  involving "click" -> q166 Pearson denominator 0 for non-click pairs;
- two days of near-identical volume -> q191 ACF zero-variance tails and
  q228 runs-test vr = 0 (n1 = n2 = 1 makes the numerator's
  (2*n1*n2 - n1 - n2) factor vanish);
- zero purchase events -> q167 pooled conversion pp = 0, z undefined.

The r8 all-ties sweep axis added four more zero-variance victims, all
pinned here on the same fixture (events.value is constant 10.0, and a
constant-l_quantity lineitem is written alongside): q79's corr (Spark's
fused Corr THROWS under ANSI at zero variance -- re-expressed as
try_divide(covar_pop, sdp*sdp)), q145's max|z| (mad = 0), q171's
F-statistic and eta-squared (ssw = ssb = 0), and q253's zone width
(vmax = vmin -> one zone, file 0, on both engines).
"""
from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from airquality_data_pipeline_spark.queries import ORACLE, QUERIES
from tests.oracle_utils import compare

QUERY_NAMES = [
    "q166_series_correlation",
    "q167_ab_test",
    "q191_acf",
    "q228_runs_test",
    "q79_stat_aggs",
    "q145_mad_outliers",
    "q171_anova_f",
    "q253_zone_map_skipping",
]


@pytest.fixture(scope="module")
def degenerate_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("degenerate")
    # 2 days x 2 hours; per hour one event of each non-purchase type, so
    # every hourly pair series is (1,1,1,1); one extra click on day 2
    # perturbs only click-pairs and makes the two daily totals differ
    # by exactly one (one up day, one down day around the median).
    types = ["view", "click", "signup", "error"]
    rows = []
    for day in (1, 2):
        for hour in (9, 10):
            for i, et in enumerate(types):
                rows.append((f"2024-01-0{day}T{hour:02d}:{i:02d}:00", et))
    rows.append(("2024-01-02T10:59:00", "click"))
    ts = pa.array(
        [np.datetime64(t, "us") for t, _ in rows], pa.timestamp("us")
    )
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(1, n + 1), pa.int64()),
                "ts": ts,
                "user_id": pa.array(
                    [i % 7 + 1 for i in range(n)], pa.int64()
                ),
                "event_type": pa.array([et for _, et in rows]),
                "value": pa.array([10.0] * n),
                "props": pa.array([json.dumps({"k": 1})] * n),
            }
        ),
        str(out / "events.parquet"),
    )
    # constant-quantity lineitem: q79's corr denominator is 0
    n_li = 12
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(range(1, n_li + 1), pa.int64()),
                "l_partkey": pa.array([1] * n_li, pa.int64()),
                "l_suppkey": pa.array([1] * n_li, pa.int64()),
                "l_linenumber": pa.array([1] * n_li, pa.int32()),
                "l_quantity": pa.array([5.0] * n_li),
                "l_extendedprice": pa.array(
                    [100.0 + 7.0 * i for i in range(n_li)]
                ),
                "l_discount": pa.array([0.01 * (i % 4) for i in range(n_li)]),
                "l_tax": pa.array([0.02] * n_li),
                "l_returnflag": pa.array(["N", "R", "A"] * (n_li // 3)),
                "l_linestatus": pa.array(["O", "F"] * (n_li // 2)),
                "l_shipdate": pa.array(
                    [np.datetime64("1996-03-01", "us")] * n_li,
                    pa.timestamp("us"),
                ),
            }
        ),
        str(out / "lineitem.parquet"),
    )
    return str(out)


@pytest.fixture(scope="module")
def degenerate_duck(degenerate_dir):
    import duckdb

    con = duckdb.connect()
    for t in ("events", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{degenerate_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_degenerate_division_parity(name, spark, degenerate_dir, degenerate_duck):
    df = QUERIES[name](spark, degenerate_dir)
    rows = df.collect()  # would raise DIVIDE_BY_ZERO before the fix
    assert rows, f"{name} returned no rows on the degenerate fixture"
    problems = compare(df, degenerate_duck, ORACLE[name])
    assert not problems, problems


def test_degeneracy_actually_hit(spark, degenerate_dir):
    """The fixture must produce at least one NULL statistic per query —
    otherwise the parity assertions above prove nothing."""
    nulls = {}
    for name, col in [
        ("q166_series_correlation", "r"),
        ("q167_ab_test", "z"),
        ("q191_acf", "acf"),
        ("q228_runs_test", "z"),
        ("q79_stat_aggs", "corr_qty_price"),
        ("q145_mad_outliers", "max_abs_z"),
        ("q171_anova_f", "f_stat"),
    ]:
        rows = QUERIES[name](spark, degenerate_dir).collect()
        nulls[name] = sum(1 for row in rows if row[col] is None)
    assert all(v > 0 for v in nulls.values()), nulls
    # q253's degeneracy is NULL-free by design: a zero value range must
    # collapse the clustered layout to exactly one zone (file 0)
    zones = {
        row.layout: row.n_files
        for row in QUERIES["q253_zone_map_skipping"](
            spark, degenerate_dir
        ).collect()
    }
    assert zones["value_clustered"] == 1, zones


@pytest.fixture(scope="module")
def constant_ts_dir(tmp_path_factory):
    """Every event at the SAME instant (the constant_ts robustness
    axis): inter-event durations and the trend regressor's variance are
    identically zero."""
    out = tmp_path_factory.mktemp("constant_ts")
    n = 12
    ts = pa.array(
        [np.datetime64("2024-01-05T12:00:00", "us")] * n,
        pa.timestamp("us"),
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(1, n + 1), pa.int64()),
                "ts": ts,
                "user_id": pa.array([i % 3 + 1 for i in range(n)], pa.int64()),
                "event_type": pa.array(
                    ["view", "click", "purchase", "signup"] * (n // 4)
                ),
                "value": pa.array([float(10 + i) for i in range(n)]),
                "props": pa.array([json.dumps({"k": 1})] * n),
            }
        ),
        str(out / "events.parquet"),
    )
    return str(out)


@pytest.mark.parametrize(
    "name", ["q87_time_weighted_avg", "q163_grouped_linear_trend"]
)
def test_constant_ts_degeneracy_parity(name, spark, constant_ts_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{constant_ts_dir}/events.parquet'"
    )
    df = QUERIES[name](spark, constant_ts_dir)
    rows = df.collect()  # raised DIVIDE_BY_ZERO before the r8 fix
    assert rows, f"{name} returned no rows on the constant-ts fixture"
    problems = compare(df, con, ORACLE[name])
    assert not problems, problems
    col = "twa" if name == "q87_time_weighted_avg" else "slope"
    assert any(row[col] is None for row in rows)
    con.close()


def test_q220_high_magnitude_product_parity(spark, tmp_path):
    # hot_key-x10 sweep catch (r9): q220's sufficient statistics used
    # CAST(x*x AS DECIMAL(24,6)) — for x ~ 1e6, x*x*1e6 >> 2^53, where
    # Spark's exact-BigDecimal cast and DuckDB's scaled-float cast
    # diverge by ~100 ULPs (syy drifted, var_y flipped 1e-6 quanta).
    # The rewrite keeps everything in exact integer micro-units; this
    # fixture concentrates extreme per-user magnitude (one user, huge
    # values) so any reintroduced double->decimal hop diverges again.
    import duckdb

    n = 400
    ts = np.array(
        ["2024-01-10T00:00:00"] * (n // 2) + ["2024-01-20T00:00:00"] * (n // 2),
        dtype="datetime64[us]",
    )
    users = np.array(([7] * (n - 20)) + list(range(10)) * 2, dtype="int64")
    value = np.full(n, 999999.999999)
    pq.write_table(
        pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts),
            "user_id": pa.array(users),
            "event_type": pa.array(["view"] * n),
            "value": pa.array(value),
            "props": pa.array(["{}"] * n),
        }),
        str(tmp_path / "events.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    probs = compare(
        QUERIES["q220_cuped"](spark, str(tmp_path)),
        con,
        ORACLE["q220_cuped"],
    )
    assert probs == []


NO_PURCHASES_QUERIES = ["q190_roc_auc", "q196_decile_lift", "q262_woe_iv"]


@pytest.fixture(scope="module")
def no_purchases_dir(tmp_path_factory):
    """The no_purchases robustness axis (r10): the 'purchase' event
    type never occurs, so every label-based ratio hits n_pos = 0.
    Caught three ANSI DIVIDE_BY_ZERO crashes: q190's AUC denominator
    2*a*b, q196's pos_total capture/lift denominators, and q262's
    class-share totals — all now try_divide, NULL like the oracle's
    /0 (and q262's 0.0001 floor takes over identically because BOTH
    engines' greatest() skip NULLs)."""
    from tests.robustness.gen_alt_fixture import generate

    out = str(tmp_path_factory.mktemp("no_purchases"))
    generate(out, seed=13, scale=1.0, axis="no_purchases")
    return out


@pytest.fixture(scope="module")
def no_purchases_duck(no_purchases_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{no_purchases_dir}/events.parquet'"
    )
    yield con
    con.close()


def test_no_purchases_fixture_shape(no_purchases_dir):
    import duckdb

    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM '{no_purchases_dir}/events.parquet' "
        f"WHERE event_type = 'purchase'"
    ).fetchone()[0]
    con.close()
    assert n == 0


@pytest.mark.parametrize("name", NO_PURCHASES_QUERIES)
def test_zero_positives_parity(name, spark, no_purchases_dir, no_purchases_duck):
    df = QUERIES[name](spark, no_purchases_dir)
    rows = df.collect()  # raised DIVIDE_BY_ZERO before the fix
    assert rows, f"{name} returned no rows on the zero-positive fixture"
    probs = compare(df, no_purchases_duck, ORACLE[name])
    assert not probs, probs
