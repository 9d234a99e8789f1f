"""Alt-fixture robustness sweep: full-catalog Spark-vs-DuckDB parity on
a fixture set the queries have never seen.

The driver regenerates /root/testdata each round; parity that holds only
by fixture accident (tie patterns, value ranges, float-product rounding
luck, language mix) breaks on regen. This runner generates an
alternative-seed hostile fixture (tests/robustness/gen_alt_fixture.py)
and replays the driver-replica recipe (.claude/skills/verify/SKILL.md)
against it. Found r6: q219's float32 x*x quantization drift — green on
every seed-42 SF, one quantum off on the first alt seed tried.

Usage:
    python tests/robustness/run_sweep.py [seed] [scale]
    # or several at once:
    for s in 7 11 23; do python tests/robustness/run_sweep.py $s 1.0; done

Runs from any cwd (spins its own hostile SparkSession: non-UTC timezone,
odd shuffle-partition count). ~3-4 min per sweep at scale 1.
"""
from __future__ import annotations

import importlib.util
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main(
    seed: int = 7,
    scale: float = 1.0,
    axis: str | None = None,
    only: list[str] | None = None,
) -> int:
    sys.path.insert(0, REPO)
    from tests.robustness.gen_alt_fixture import generate

    tag = f"seed{seed}_x{scale:g}" + (f"_{axis}" if axis else "")
    sfdir = os.path.join(tempfile.gettempdir(), "testdata_alt", tag)
    generate(sfdir, seed, scale, axis)

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    # size the session to the sweep scale: the default 1g driver heap
    # dies (py4j ConnectionRefused cascade) on scale >= ~50 fixtures
    cores, mem = ("local[4]", "4g") if scale < 10 else ("local[8]", "12g")
    spark = (
        SparkSession.builder.master(cores)
        .config("spark.driver.memory", mem)
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "13")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    from tests.oracle_utils import compare

    con = duckdb.connect()
    # keep oracle spill out of the repo cwd (DuckDB defaults to ./.tmp)
    con.execute(f"SET temp_directory='{tempfile.gettempdir()}/duckdb_spill'")
    # cap the referee so resource exhaustion is a CATCHABLE DuckDB
    # exception (spill -> IOException at the disk limit, or
    # OutOfMemoryException), never a kernel OOM kill of the whole
    # sweep: unlimited, q45's quadratic ground truth at scale 100 grew
    # the process to 125 GB anon RSS and the OOM killer took the
    # sweep down mid-catalog. preserve_insertion_order=false lets big
    # materializations stream instead of buffering ordered.
    con.execute("SET memory_limit='48GB'")
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'"
        )

    qs, osql = mod.queries(), mod.oracle_sql()
    # Above ~50x the hostile fixture's DEGENERATE shapes (10 tight
    # embedding clusters) make true near-dup mass quadratic — q45's
    # result alone is ~1e8 pairs, and the strict comparator's
    # driver-side Counter + pandas copies OOM on it. Those queries
    # switch to oracle_utils.compare_bounded (streamed count +
    # order-insensitive md5-sum, O(1) driver memory) instead of being
    # skipped, so every scale reports all 263 queries.
    bounded_large = {"q45_embedding_neardup", "q229_dedup_pr_harness"}
    from tests.oracle_utils import compare_bounded

    fails, empties = 0, []
    # ENVELOPE = value-parity NOT verified this sweep (referee or both
    # engines exceeded the box). Tracked explicitly so rounds can't
    # quietly accumulate permanently-unverified queries (r9 ADVICE):
    # the list lands in the RESULT line and a JSON sidecar next to the
    # fixture; record it in ROADMAP with every sweep.
    envelopes: list[str] = []
    t0 = time.time()
    for name in sorted(qs):
        if only and name not in only:
            continue
        cmp_fn = (
            compare_bounded
            if scale >= 50 and name in bounded_large
            else compare
        )
        try:
            df = qs[name](spark, sfdir)
            if name in osql:
                try:
                    probs = cmp_fn(df, con, osql[name])
                except Exception as oexc:  # noqa: BLE001
                    # Oracle-envelope: the DuckDB REFEREE exhausting
                    # machine resources (q229's exact-Jaccard ground
                    # truth spills ~80+ GB on the degenerate 100x
                    # fixture) is a limit of the single-node oracle,
                    # not an engine defect — but only if the ENGINE
                    # side actually completes. Prove that with a
                    # count, report loudly, and don't count a fail;
                    # any other referee exception stays a failure.
                    msg = str(oexc)
                    resource = isinstance(oexc, MemoryError) or any(
                        s in msg
                        for s in ("No space left", "OutOfMemory",
                                  "out of memory", "Could not allocate")
                    )
                    if not resource:
                        raise
                    # prove the engine side completes — but a
                    # deliberately degenerate harness fixture (10
                    # tight clusters -> ~1e8 true near-dup pairs at
                    # scale 100) can exceed one box's disk on BOTH
                    # engines (q45's exact-verify join spills ~100 GB
                    # of array-carrying pair rows). Report that
                    # honestly as an envelope too: it is a
                    # single-machine capacity limit, not a wrong
                    # answer, and the query has full-value parity at
                    # every scale where either engine fits the box.
                    try:
                        n_engine = df.count()
                    except Exception as eexc:  # noqa: BLE001
                        emsg = str(eexc)
                        if not any(
                            s in emsg
                            for s in ("No space left", "OutOfMemory",
                                      "SPILL_OUT_OF_MEMORY",
                                      "out of memory")
                        ):
                            raise
                        print(
                            f"ENVELOPE {name}: BOTH engines exceeded "
                            f"single-box resources on the degenerate "
                            f"fixture (duck: {msg[:120]} | spark: "
                            f"{emsg[:120]})"
                        )
                        envelopes.append(name)
                        continue
                    print(
                        f"ENVELOPE {name}: engine completed "
                        f"({n_engine} rows); DuckDB referee exceeded "
                        f"machine resources: {msg[:200]}"
                    )
                    envelopes.append(name)
                    continue
                fails += bool(probs)
                if probs:
                    print(f"FAIL {name}", *probs, sep="\n  ")
                if cmp_fn is compare_bounded:
                    print(f"BOUNDED {name}: count+hash comparison "
                          f"({'ok' if not probs else 'MISMATCH'})")
            elif df.count() == 0:
                empties.append(name)
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            fails += 1
            print(f"ERROR {name}: {type(exc).__name__}: {str(exc)[:300]}")
    if empties:
        print("ROWS-ONLY EMPTIES:", empties)
    verdict = "ALL MATCH" if fails == 0 else f"{fails} FAILURES"
    if envelopes:
        verdict += f" + {len(envelopes)} ENVELOPE {sorted(envelopes)}"
        import json

        with open(os.path.join(sfdir, "envelopes.json"), "w") as fh:
            json.dump({"tag": tag, "envelopes": sorted(envelopes)}, fh)
    print(
        f"RESULT seed={seed} scale={scale:g} axis={axis}: {verdict} "
        f"({time.time() - t0:.0f}s, {len(qs)} queries)"
    )
    return fails


if __name__ == "__main__":
    # usage: run_sweep.py [seed] [scale] [axis] [only]
    #   axis: "-" or a gen_alt_fixture axis name
    #   only: comma-separated query names — resume a partial sweep
    #         (e.g. after an oracle-envelope abort) without redoing
    #         the whole catalog
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    axis = sys.argv[3] if len(sys.argv) > 3 else None
    if axis in ("-", "none", "None"):
        axis = None
    only = sys.argv[4].split(",") if len(sys.argv) > 4 else None
    raise SystemExit(main(seed, scale, axis, only))
