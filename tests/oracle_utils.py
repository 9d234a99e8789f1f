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


def _hash_acc():
    return {"n": 0, "h": 0}


_HASH_MOD = (1 << 127) - 1  # Mersenne prime — cheap mod, no bias


def _acc_rows(acc, rows, order):
    import hashlib

    for row in rows:
        t = tuple(_norm_value(row[i]) for i in order)
        digest = hashlib.md5(repr(t).encode()).digest()
        acc["h"] = (acc["h"] + int.from_bytes(digest, "big")) % _HASH_MOD
        acc["n"] += 1


def compare_bounded(spark_df, duck_con, oracle_sql_text, batch=50_000):
    """Order-insensitive multiset comparison in O(1) driver memory: both
    engines stream their result through the SAME normalization as
    `compare` (`_norm_value`, columns in sorted-name order) into a
    (count, sum-of-md5 mod 2^127-1) accumulator — no Counter of the full
    result, no pandas copy. For quadratic-output harness queries (q45's
    ~1e8 near-dup pairs at the 100x robustness scale) the strict
    comparator's driver-side materialization OOMs; this one is bounded
    by ONE Spark partition / ONE Arrow batch at a time. Weaker than
    `compare` only in diagnostics (no sample rows on mismatch) and in
    skipping the pandas dtype-kind probe (which would materialize); the
    value verdict itself is equivalent up to md5-sum collision (~2^-64
    for any realistic result size)."""
    s_cols = spark_df.columns
    d_cur = duck_con.execute(oracle_sql_text)
    d_cols = [d[0] for d in d_cur.description]
    if sorted(map(str.lower, s_cols)) != sorted(map(str.lower, d_cols)):
        return [
            f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
        ]
    s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i].lower())
    d_order = sorted(range(len(d_cols)), key=lambda i: d_cols[i].lower())

    d_acc = _hash_acc()
    reader = d_cur.fetch_record_batch(batch)
    try:
        for rb in reader:
            cols = [c.to_pylist() for c in rb.columns]
            _acc_rows(d_acc, list(zip(*cols)) if cols else [], d_order)
    except StopIteration:
        pass

    s_acc = _hash_acc()
    buf = []
    for row in spark_df.toLocalIterator(prefetchPartitions=False):
        buf.append(row)
        if len(buf) >= batch:
            _acc_rows(s_acc, buf, s_order)
            buf = []
    _acc_rows(s_acc, buf, s_order)

    problems = []
    if s_acc["n"] != d_acc["n"]:
        problems.append(
            f"row count mismatch: spark={s_acc['n']} duck={d_acc['n']}"
        )
    if s_acc["h"] != d_acc["h"]:
        problems.append(
            f"order-insensitive value-hash mismatch over "
            f"{s_acc['n']}/{d_acc['n']} rows"
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
