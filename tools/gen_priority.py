"""Mechanical generator for the driver-window priority list.

The external driver checks only a ~50-entry prefix of the query catalog
each round, so ordering is evidence policy: queries whose driver
CORRECTNESS evidence is missing or stale must come first.  Round 8
showed that hand-maintaining the list invites arithmetic bugs (the
"backlog -> 2" doc drift); this generator derives the order purely from
the committed evidence ledger (``CORRECTNESS_r*.json`` at the repo
root) plus an explicit ``modified`` head for queries whose code changed
after their latest green row.

Policy (oldest-evidence-first, the r9 VERDICT item 7 contract; block
order revised mid-r10 when the floor-grid ratchet modified ~79
queries at once and would otherwise have pushed the last never-checked
query out of the window):

1. Never-green queries (no green ledger row at all), numeric order —
   NO driver row is strictly less evidence than a stale one, so these
   outrank even modified queries.
2. ``modified`` queries, in the given order — their latest green row
   predates the current code, so a fresh row is worth more than
   re-confirming unchanged code.
3. Everything else ascending by latest green round, numeric order
   within a round.

A ledger row counts as *green* only when ``err`` is null and
``rows_match``/``schema_match``/``hash_match`` are all true — a failed
or errored row is not evidence, so such a query sorts with the
never-green block.

Usage (from the repo root)::

    python tools/gen_priority.py [--modified q149_pagerank ...]

writes ``airquality_data_pipeline_spark/queries/_priority.py``.  The
suite pins the committed file to this generator's output
(``tests/test_operators.py::test_priority_list_is_generated``), so the
hand-edit failure mode is mechanically extinct.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
from typing import Iterable, Mapping

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GENERATED = os.path.join(
    REPO_ROOT, "airquality_data_pipeline_spark", "queries", "_priority.py"
)

_NUM = re.compile(r"^q(\d+)")


def _numeric_key(name: str) -> tuple[int, str]:
    m = _NUM.match(name)
    return (int(m.group(1)) if m else 10**9, name)


def load_ledger(
    root: str = REPO_ROOT, files: list[str] | None = None
) -> dict[str, int]:
    """Latest *green* round per query from CORRECTNESS_r*.json files.

    `files` restricts to a recorded snapshot (basenames) — the pin
    test passes the LEDGER_FILES list captured in the generated file,
    so a NEW round's record landing mid-round doesn't retroactively
    fail the pin; the next regeneration picks it up."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        if files is not None and os.path.basename(path) not in files:
            continue
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def compute_priority(
    catalog: Iterable[str],
    ledger: Mapping[str, int],
    modified: Iterable[str] = (),
) -> list[str]:
    """Full catalog ordering per the module-docstring policy."""
    catalog = list(catalog)
    catalog_set = set(catalog)
    modified = list(modified)
    unknown = [n for n in modified if n not in catalog_set]
    if unknown:
        raise ValueError(f"modified names not in catalog: {unknown}")
    never = sorted(
        (n for n in catalog if n not in ledger), key=_numeric_key
    )
    seen = set(never)
    mod_tail = [n for n in modified if n not in seen]
    seen.update(mod_tail)
    rest = sorted(
        (n for n in catalog if n not in seen),
        key=lambda n: (ledger[n], _numeric_key(n)),
    )
    return [*never, *mod_tail, *rest]


def render(
    priority: list[str], modified: list[str], ledger_files: list[str]
) -> str:
    lines = [
        '"""Driver-window priority order — GENERATED, do not hand-edit.',
        "",
        "Regenerate with ``python tools/gen_priority.py`` (see that module",
        "for the ordering policy).  ``MODIFIED`` records the queries whose",
        "code changed after their latest green driver row this round; they",
        "lead the window.  ``LEDGER_FILES`` snapshots which CORRECTNESS",
        "records this order was derived from, so a new round's record",
        "landing mid-round doesn't retroactively fail the pin test.  The",
        "suite asserts this file matches the generator output for exactly",
        "that snapshot.",
        '"""',
        "",
        "MODIFIED = [",
        *(f'    "{n}",' for n in modified),
        "]",
        "",
        "LEDGER_FILES = [",
        *(f'    "{n}",' for n in ledger_files),
        "]",
        "",
        "PRIORITY = [",
        *(f'    "{n}",' for n in priority),
        "]",
        "",
    ]
    return "\n".join(lines)


def main() -> None:
    import sys

    if REPO_ROOT not in sys.path:
        sys.path.insert(0, REPO_ROOT)
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--modified", nargs="*", default=[])
    args = ap.parse_args()

    # NOTE: after renaming/removing a catalog query, the package import
    # below raises until _priority.py stops referencing the old name —
    # delete the stale line from _priority.py by hand, then regenerate.
    from airquality_data_pipeline_spark.queries import QUERIES

    ledger_files = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json"))
    )
    priority = compute_priority(
        list(QUERIES), load_ledger(files=ledger_files), args.modified
    )
    with open(GENERATED, "w") as fh:
        fh.write(render(priority, list(args.modified), ledger_files))
    print(f"wrote {GENERATED}: {len(priority)} names, head={priority[:6]}")


if __name__ == "__main__":
    main()
