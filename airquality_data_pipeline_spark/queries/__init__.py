"""Oracle-checked query catalog.

Each module registers (spark builder, DuckDB oracle SQL) pairs into the
shared registry. Importing this package populates it.

Registration order is deliberate: the external driver checks a ~50-entry
prefix of the catalog each round, so _PRIORITY puts the queries that
most need a fresh CORRECTNESS row first. Since round 10 the order is
GENERATED from the committed evidence ledger by tools/gen_priority.py
(policy: never-driver-checked queries lead — no row at all is less
evidence than a stale one — then queries modified after their latest
green driver row, then ascending latest-evidence round) and pinned by
a test — the hand-maintained-count failure mode (r8's "backlog -> 2"
drift) is extinct. Round-10 window: the last 4 never-checked
(q211/q212/q213/q216 — backlog hits 0), then the modified block
newest-change-first — the 15 ancient_ts epoch-floor fixes, the ~20
further queries whose oracles moved off DuckDB's truncating
epoch_ms, the 19 null_text fixes, q165 + the 8 null_mass fixes, and
the ~79 floor-grid conversions (each class's green rows predate its
change; see ROADMAP r10) — oldest evidence beyond the window. All 263 queries are locally parity-green
at sf0.001/0.01/0.1 under the hostile replica
(tests/test_oracle_parity.py); the window exists purely to convert
local evidence into driver CORRECTNESS rows. Ledger note: the green
q121_simhash64_neardup rows map to q117's 64-bit form since r5 (the
entry was folded in); the generator ignores ledger-only names.
"""

from __future__ import annotations

from airquality_data_pipeline_spark.queries.registry import ORACLE, QUERIES

# populate the registry
from airquality_data_pipeline_spark.queries import relational  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import relational2  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import relational3  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import advanced  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import pipeline  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import dedup  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import similarity  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import text  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import llmops  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import multimodal  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import advanced2  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import advanced3  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import advanced4  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import llmops2  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import tpch2  # noqa: E402,F401
from airquality_data_pipeline_spark.queries import llmops3  # noqa: E402,F401

# Driver-window order: GENERATED from the CORRECTNESS ledger by
# tools/gen_priority.py (never hand-edit _priority.py; see that
# module for the policy and tests/test_operators.py for the pin).
from airquality_data_pipeline_spark.queries._priority import (  # noqa: E402
    PRIORITY as _PRIORITY,
)


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in QUERIES]
    if missing:
        raise ValueError(
            f"priority list references unknown queries: {missing}"
        )
    rest = [n for n in QUERIES if n not in set(_PRIORITY)]
    for mapping in (QUERIES, ORACLE):
        ordered = {
            n: mapping[n] for n in (*_PRIORITY, *rest) if n in mapping
        }
        mapping.clear()
        mapping.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLE"]
