"""Audit the registry-time non-finite rewrite (r12 conversion).

nonfinite_null_sql (queries/common.py) wraps every DECIMAL / floor-grid
HUGEINT cast in every oracle at registration, enforcing the
non-finite-as-NULL grid convention mechanically instead of via ~150
hand-edited sites (the sql_floor_ms one-place principle, r10 ADVICE).
This tool is the audit trail for that rewrite:

1. IDEMPOTENT: re-transforming every registered oracle is a no-op
   (a non-idempotent rewrite would stack wrappers on any future
   re-registration or tooling pass).
2. VALID: DuckDB can bind every transformed oracle against the
   sf0.001 views (EXPLAIN — parse + bind, no execution).
3. COVERAGE: per-module counts of wrapped sites, so a reviewer can see
   the rewrite's actual footprint.

Value-level equivalence on finite data is checked by the stronger
gates that run anyway: tests/test_oracle_parity.py and the driver
replica (all 263 oracles, bit-exact vs Spark).

Usage: python tools/audit_nonfinite.py [sf_dir]
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(sf_dir: str = "/root/testdata/sf0.001") -> int:
    from airquality_data_pipeline_spark.queries import ORACLE
    from airquality_data_pipeline_spark.queries.common import (
        nonfinite_null_sql,
    )

    bad_idem = []
    wrapped = 0
    for name, sql in ORACLE.items():
        if nonfinite_null_sql(sql) != sql:
            bad_idem.append(name)
        wrapped += sql.count("isfinite(CAST((")
    print(f"oracles: {len(ORACLE)}; finite-wrapped sites: {wrapped}")
    if bad_idem:
        print(f"NOT IDEMPOTENT ({len(bad_idem)}): {bad_idem}")
        return 1

    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    bad_sql = []
    for name, sql in ORACLE.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001
            bad_sql.append((name, f"{type(exc).__name__}: {str(exc)[:160]}"))
    if bad_sql:
        for name, err in bad_sql:
            print(f"INVALID {name}: {err}")
        return 1
    print(f"all {len(ORACLE)} transformed oracles bind in DuckDB: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
