"""Local replica of the driver's Spark-vs-DuckDB comparison.

Stricter than the driver: values must match exactly (bit-exact floats)
after normalization, so anything that passes here passes any reasonable
order-insensitive value hash.
"""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter
from decimal import Decimal


def _norm_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    return v


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(_norm_value(row[i]) for i in order) for row in rows)


def spark_rows(df):
    cols = df.columns
    return [tuple(r[c] for c in cols) for r in df.collect()], cols


def duck_rows(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cur.fetchall(), cols


def _dtype_problems(spark_df, duck_con, oracle_sql_text):
    """Replicate the driver's pandas-level sensitivity: it converts both
    results to pandas and value-hashes them, so (a) list/array cells crash
    its canonicalizer ("unhashable type: 'list'") and (b) dtype-kind drift
    (e.g. DuckDB SUM(BIGINT) -> HUGEINT -> float64/object vs Spark int64)
    hash-mismatches even when Python-level values are equal."""
    s_pdf = spark_df.toPandas()
    d_pdf = duck_con.execute(oracle_sql_text).df()
    d_by_lower = {c.lower(): c for c in d_pdf.columns}
    problems = []
    for c in s_pdf.columns:
        dc = d_by_lower.get(c.lower())
        if dc is None:
            continue  # schema mismatch reported elsewhere
        for eng, series in (("spark", s_pdf[c]), ("duck", d_pdf[dc])):
            if series.dtype.kind == "O" and any(
                isinstance(v, (list, tuple, dict, set)) or hasattr(v, "__array__")
                for v in series.head(50)
            ):
                problems.append(
                    f"column {c}: {eng} side has unhashable container values "
                    "(driver canonicalizer crash) — serialize to string/scalars"
                )
        sk, dk = s_pdf[c].dtype.kind, d_pdf[dc].dtype.kind
        if sk != dk:
            problems.append(
                f"column {c}: pandas dtype kind mismatch spark={s_pdf[c].dtype} "
                f"duck={d_pdf[dc].dtype} (driver value-hash will differ)"
            )
    return problems


def compare(spark_df, duck_con, oracle_sql_text):
    s_rows, s_cols = spark_rows(spark_df)
    d_rows, d_cols = duck_rows(duck_con, oracle_sql_text)
    problems = []
    if sorted(map(str.lower, s_cols)) != sorted(map(str.lower, d_cols)):
        problems.append(f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    problems.extend(_dtype_problems(spark_df, duck_con, oracle_sql_text))
    if len(s_rows) != len(d_rows):
        problems.append(f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}")
    s_norm = _normalize(s_rows, [c.lower() for c in s_cols])
    d_norm = _normalize(d_rows, [c.lower() for c in d_cols])
    if s_norm != d_norm:
        only_s = list((s_norm - d_norm).items())[:5]
        only_d = list((d_norm - s_norm).items())[:5]
        problems.append(
            f"value mismatch: {sum((s_norm - d_norm).values())} spark-only / "
            f"{sum((d_norm - s_norm).values())} duck-only rows\n"
            f"  spark-only sample: {only_s}\n  duck-only sample: {only_d}"
        )
    return problems
