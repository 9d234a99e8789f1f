"""Ancient-timestamp regression: every driver fixture timestamp is
post-1970, so negative-epoch arithmetic was untested until the r10
``ancient_ts`` sweep axis (tests/robustness/gen_alt_fixture.py) moved
the event timeline to 1965.  It caught SIXTEEN cross-engine defects in
one pass, all one mechanism: on NEGATIVE operands, truncating integer
division (DuckDB's ``//`` on integers, DuckDB's ``epoch_ms``) and
flooring division (Spark's ``unix_millis``, ``F.floor(x / k)``)
differ by one unit.

- DuckDB ``epoch_ms(ts)`` truncates sub-ms microseconds toward zero
  while Spark ``unix_millis`` floors: every oracle emission of epoch
  millis was one ms high on pre-1970 timestamps with a fractional ms
  (15 queries: q17, q23, q26, q28, q29, q30, q33, q34, q77, q80, q87,
  q91, q156, q174, and the drift propagated into session/as-of/range
  join keys and time-weighted durations).  Fixed catalog-wide by a
  mechanical conversion of oracle ``epoch_ms(x)`` to PURE-INTEGER
  floor division (``epoch_us(x) // 1000`` with a ``CASE``-correction
  of -1 when the remainder is negative, 66 sites).  The first fix
  attempt used ``floor(epoch_us(x) / 1000.0)`` — exact below 2^53 µs
  but probed WRONG on ~0.1% of microsecond offsets past it (year
  ~2255+, where one double ulp exceeds the /1000 fraction); the
  ``far_future`` axis (events in 2260) exists to keep that regime
  covered, and this module pins the same 15 queries on BOTH eras.
- q223's cohort week used DuckDB ``days // 7`` (truncation) against
  Spark ``floor(days / 7)``: pre-1970 days land one week late on
  exactly one engine.

Convention: FLOOR is the bucket semantic everywhere ("the unit
containing this instant"), matching Spark's built-ins; oracles state
it explicitly.  This suite pins the class on the exact sweep fixtures.
"""
from __future__ import annotations

import pytest

from airquality_data_pipeline_spark.queries import ORACLE, QUERIES
from tests.oracle_utils import compare
from tests.robustness.gen_alt_fixture import generate

QUERY_NAMES = [
    "q17_datetime_tz",
    "q23_cursor_incremental_filter",
    "q26_greatest_merge",
    "q28_retention_filter",
    "q29_ragged_union",
    "q30_sessionization",
    "q33_asof_join",
    "q34_range_join",
    "q77_range_frame",
    "q80_ignore_nulls",
    "q87_time_weighted_avg",
    "q91_running_distinct",
    "q156_scd2_intervals",
    "q174_time_travel_lookup",
    "q223_cohort_ltv",
]


@pytest.fixture(scope="module")
def ancient_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ancient_ts"))
    generate(out, seed=13, scale=1.0, axis="ancient_ts")
    return out


@pytest.fixture(scope="module")
def ancient_duck(ancient_dir):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{ancient_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def test_epochs_actually_negative_with_sub_ms(ancient_dir):
    """The axis must produce pre-1970 timestamps whose microseconds
    don't align to the ms grid — the only regime where truncation and
    floor differ — otherwise the parity assertions prove nothing."""
    import duckdb

    con = duckdb.connect()
    neg, ragged = con.execute(
        f"SELECT SUM(CASE WHEN ts < TIMESTAMP '1970-01-01' THEN 1 END),"
        f" SUM(CASE WHEN epoch_us(ts) % 1000 <> 0 THEN 1 END)"
        f" FROM '{ancient_dir}/events.parquet'"
    ).fetchone()
    con.close()
    assert neg and neg > 0
    assert ragged and ragged > 0


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_ancient_ts_parity(name, spark, ancient_dir, ancient_duck):
    df = QUERIES[name](spark, ancient_dir)
    problems = compare(df, ancient_duck, ORACLE[name])
    assert not problems, problems


@pytest.fixture(scope="module")
def future_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("far_future"))
    generate(out, seed=13, scale=1.0, axis="far_future")
    return out


@pytest.fixture(scope="module")
def future_duck(future_dir):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{future_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def test_epochs_actually_past_2_53(future_dir):
    import duckdb

    con = duckdb.connect()
    n = con.execute(
        f"SELECT SUM(CASE WHEN epoch_us(ts) > 9007199254740992 THEN 1 "
        f"END) FROM '{future_dir}/events.parquet'"
    ).fetchone()[0]
    con.close()
    assert n and n > 0


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_far_future_parity(name, spark, future_dir, future_duck):
    """Past 2^53 µs a float detour in the oracle's epoch math drifts
    on ~0.1% of offsets — the integer floor-div form must not."""
    df = QUERIES[name](spark, future_dir)
    problems = compare(df, future_duck, ORACLE[name])
    assert not problems, problems
