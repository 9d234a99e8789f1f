"""Sampled-referee mechanics (r11 verdict item 4): at sweep scale
>= 50 the two quadratic-pair queries (q45, q229) verify full values on
a deterministic 1-in-10 id-sample of their blow-up table instead of
the count-only ENVELOPE path. These tests pin the machinery at x1 so
a regression is a test failure, not a scale-100 surprise:

- the sampled universe preserves schemas exactly (a DuckDB parquet
  rewrite that changed a type would silently desync the engines),
- the sample predicate is the documented id % 10 = 0,
- non-blow-up tables are shared (symlinks), so both engines see one
  consistent universe,
- strict full-value parity holds for both queries on the sample.
"""
from __future__ import annotations

import os

import pytest

from tests.robustness.run_sweep import (
    SAMPLE_MOD,
    SAMPLED_LARGE,
    TABLES,
    build_sample_dir,
)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    from tests.robustness.gen_alt_fixture import generate

    out = str(tmp_path_factory.mktemp("sampled_ref"))
    generate(out, seed=7, scale=1.0)
    return out


@pytest.fixture(scope="module")
def sample_dir(fixture_dir):
    return build_sample_dir(fixture_dir)


def test_sample_dir_shape(fixture_dir, sample_dir):
    import duckdb

    con = duckdb.connect()
    sampled = {t: idc for t, idc in SAMPLED_LARGE.values()}
    for t in TABLES:
        src = os.path.join(fixture_dir, f"{t}.parquet")
        dst = os.path.join(sample_dir, f"{t}.parquet")
        if t in sampled:
            assert not os.path.islink(dst), t
            schema_src = con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
            schema_dst = con.execute(f"DESCRIBE SELECT * FROM '{dst}'").fetchall()
            assert schema_src == schema_dst, (t, schema_src, schema_dst)
            idc = sampled[t]
            bad, n = con.execute(
                f"SELECT count(*) FILTER ({idc} % {SAMPLE_MOD} <> 0), "
                f"count(*) FROM '{dst}'"
            ).fetchone()
            assert bad == 0 and n > 0, (t, bad, n)
        else:
            assert os.path.islink(dst), t
            assert os.path.realpath(dst) == os.path.realpath(src), t
    con.close()


@pytest.mark.parametrize("name", sorted(SAMPLED_LARGE))
def test_sampled_parity(name, spark, sample_dir):
    import duckdb

    from airquality_data_pipeline_spark.queries import ORACLE, QUERIES
    from tests.oracle_utils import compare

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{sample_dir}/{t}.parquet'"
        )
    probs = compare(QUERIES[name](spark, sample_dir), con, ORACLE[name])
    con.close()
    assert not probs, probs
