"""Every oracle-checkable catalog query must match DuckDB exactly —
a local, stricter replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from airquality_data_pipeline_spark.queries import ORACLE, QUERIES
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    problems = compare(df, duck, ORACLE[name])
    assert not problems, f"{name}:\n" + "\n".join(problems)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(QUERIES) >= set(ORACLE)
