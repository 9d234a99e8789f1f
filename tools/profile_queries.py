"""Per-query profiling harness for optimization work (guide §1).

Runs a subset of the catalog with the bench's exact methodology
(noop sink, warmup, min-of-2 with a third run on >2.5x spread) and
writes {name: sec} to stdout as JSON. Usage:

    python tools/profile_queries.py q01_pricing_summary q146_ewma ...
    python tools/profile_queries.py --top 25        # 25 slowest per bench_queries.json
    python tools/profile_queries.py --explain DIR q146_ewma   # also dump explain("formatted")

Timing runs label jobs via setJobDescription so the (disabled-by-
default) UI or event logs attribute stages to queries.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from airquality_data_pipeline_spark.queries import QUERIES  # noqa: E402
from airquality_data_pipeline_spark.session import get_spark  # noqa: E402

WARMUPS = (
    "q01_pricing_summary",
    "q51_fingerprint",
    "q44_cosine_topk",
    "q117_simhash_neardup",
    "q132_incremental_dedup",
)


def run_query(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--explain", default="", help="dir for explain dumps")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    names = list(args.names)
    if args.top:
        ranked = json.load(open(f"{REPO_ROOT}/bench_queries.json"))
        names += [
            k
            for k, _ in sorted(ranked.items(), key=lambda kv: -kv[1])[
                : args.top
            ]
            if k not in names
        ]
    assert names, "no queries given"
    unknown = [n for n in names if n not in QUERIES]
    assert not unknown, f"unknown queries: {unknown}"

    spark = get_spark(app_name="profile")
    if not args.no_warmup:
        for w in WARMUPS:
            run_query(QUERIES[w](spark, args.sf_dir))

    if args.explain:
        out = Path(args.explain)
        out.mkdir(parents=True, exist_ok=True)
        for n in names:
            plan = QUERIES[n](spark, args.sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            (out / f"{n}.txt").write_text(plan)

    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    if args.runs == 0:
        print(json.dumps({"explained": sorted(set(names))}))
        return
    for qi, name in enumerate(sorted(set(names))):
        if qi % 10 == 0:
            spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"profile:{name}")
        runs = []
        for _ in range(args.runs):
            start = time.perf_counter()
            run_query(QUERIES[name](spark, args.sf_dir))
            runs.append(round(time.perf_counter() - start, 3))
        if max(runs) > 2.5 * min(runs):
            start = time.perf_counter()
            run_query(QUERIES[name](spark, args.sf_dir))
            runs.append(round(time.perf_counter() - start, 3))
        spark.sparkContext.setJobDescription(None)
        all_runs[name] = runs
        timings[name] = min(runs)

    print(json.dumps({"timings": timings, "runs": all_runs}, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
