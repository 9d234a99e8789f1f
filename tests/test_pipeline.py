"""End-to-end batch cycle tests (plans/pipeline.py) + source adapters."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from airquality_data_pipeline_spark.plans import pipeline
from airquality_data_pipeline_spark.sources import rest
from airquality_data_pipeline_spark.sources.synthetic import synthetic_measurements


def _stations(spark):
    return spark.createDataFrame(
        [
            ("DEBB001", "de", "DE", "Berlin", "Mitte", 52.5, 13.4),
            ("NL01001", "luchtmeetnet", "NL", "Amsterdam", "Centrum", 52.4, 4.9),
        ],
        "station_id string, source string, country string, city string, "
        "location_name string, lat double, lon double",
    )


def _cursors(spark):
    return spark.createDataFrame(
        [("synthetic", "DEBB001", "pm25", "2024-01-01T00:30:00")],
        "source string, station_id string, pollutant string, last_observed_at string",
    ).select("station_id", "pollutant", F.col("last_observed_at").alias("last_observed_at"))


def test_full_cycle(spark):
    bronze = synthetic_measurements(spark, n=60)
    # second "source" with ragged schema: missing lat/lon/city columns
    ragged = bronze.limit(10).select(
        "station_id", "pollutant", "value", "unit", "country", "timestamp",
        F.lit("openaq").alias("source"),
    )
    result = pipeline.silver_measurements(
        [bronze, ragged], _stations(spark), _cursors(spark)
    )
    rows = result.payload.collect()
    assert rows
    # enrichment: cataloged stations got coordinates
    for r in rows:
        if r.station_id in ("DEBB001", "NL01001"):
            assert r.lat is not None and r.city is not None
    # cursor filter: DEBB001/pm25 rows at or before the cursor are gone
    for r in rows:
        if r.station_id == "DEBB001" and r.pollutant == "pm25":
            assert r.timestamp > "2024-01-01T00:30:00"
    # dedup: composite key unique
    keys = [(r.station_id, r.pollutant, r.timestamp) for r in rows]
    assert len(keys) == len(set(keys))
    # pending cursors exist and commit moves only forward
    committed = pipeline.commit_cursors(_cursors(spark), result.pending_cursors)
    c = {
        (r.station_id, r.pollutant): r.last_observed_at
        for r in committed.collect()
    }
    assert c[("DEBB001", "pm25")] >= "2024-01-01T00:30:00"


def test_kafka_payload_shape(spark):
    bronze = synthetic_measurements(spark, n=12)
    out = pipeline.kafka_payload(bronze).collect()
    for r in out:
        body = json.loads(r.value)
        assert body["station_id"] == r.key
        assert "pollutant" in body and "timestamp" in body


def test_synthetic_deterministic(spark):
    a = synthetic_measurements(spark, n=30).collect()
    b = synthetic_measurements(spark, n=30).collect()
    assert a == b
    assert all(5 <= r.value <= 55 for r in a)
    assert {r.country for r in a} == {"DE", "NL", "PL"}


def test_rest_fetch_paginated_budget_and_backoff():
    rows = [{"station_id": f"s{i}", "pollutant": "pm25", "value": float(i),
             "timestamp": f"2024-01-01T00:{i:02d}:00Z"} for i in range(55)]
    transport = rest.fake_transport_from_rows(rows, page_size=20)
    cfg = rest.RestSourceConfig(base_url="fake://api", max_pages=10)
    got = list(rest.fetch_paginated(cfg, transport))
    assert len(got) == 55

    # budget enforcement: partial results, not an exception (reference
    # app/main.py:465-470 returns what it has when the limit is hit)
    cfg_tight = rest.RestSourceConfig(base_url="fake://api", max_pages=10, request_budget=1)
    got_partial = list(rest.fetch_paginated(cfg_tight, transport))
    assert len(got_partial) == 20  # exactly one page fetched, then stop

    # 429 retry with eventual success
    calls = {"n": 0}
    def flaky(url, params):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise rest.RateLimited("429")
        return transport(url, params)
    cfg_retry = rest.RestSourceConfig(base_url="fake://api", max_pages=1,
                                      backoff_step_s=0.0)
    got = list(rest.fetch_paginated(cfg_retry, flaky))
    assert len(got) == 20 and calls["n"] == 3

    # failed 429 attempts consume budget: 3-request budget admits the two
    # rejected attempts plus one success on page 1, then stops before p2
    calls["n"] = 0
    cfg_flaky_budget = rest.RestSourceConfig(
        base_url="fake://api", max_pages=10, request_budget=3, backoff_step_s=0.0
    )
    got = list(rest.fetch_paginated(cfg_flaky_budget, flaky))
    assert len(got) == 20 and calls["n"] == 3

    # retries exhausted still raises (permanent 429 wall)
    def always_429(url, params):
        raise rest.RateLimited("429")
    cfg_wall = rest.RestSourceConfig(base_url="fake://api", max_pages=1,
                                     max_retries=2, backoff_step_s=0.0,
                                     request_budget=100)
    try:
        list(rest.fetch_paginated(cfg_wall, always_429))
        raise AssertionError("expected RateLimited")
    except rest.RateLimited:
        pass


def test_one_shot_jobs(spark):
    from airquality_data_pipeline_spark.plans import jobs
    from pyspark.sql import functions as F

    stations = _stations(spark)
    cursors = _cursors(spark)
    wire, result = jobs.synthetic_cycle_job(spark, stations, cursors, n=40)
    assert wire.count() > 0 and set(wire.columns) == {"key", "value"}
    assert result.pending_cursors.count() > 0

    # catalog refresh keeps old values where incoming is null
    incoming = stations.select(
        "station_id",
        F.lit("refreshed").alias("source"),
        F.lit(None).cast("string").alias("country"),
        F.col("city"),
        F.col("location_name"),
        F.col("lat"),
        F.col("lon"),
    )
    merged = jobs.refresh_catalog_job(stations, incoming)
    rows = {r.station_id: r for r in merged.collect()}
    assert all(r.country is not None for r in rows.values())
    assert all(r.source == "refreshed" for r in rows.values())

    # housekeeping keeps only the trailing window
    ev = spark.createDataFrame(
        [("2024-01-01",), ("2024-01-20",), ("2024-01-21",)], "observed_at string"
    ).select(F.col("observed_at").cast("timestamp").alias("observed_at"))
    kept = jobs.housekeeping_job(ev, keep_days=7).collect()
    assert len(kept) == 2


def test_fault_isolation(spark):
    from airquality_data_pipeline_spark.plans import pipeline as P

    def broken():
        raise RuntimeError("api down")

    frames, errors = P.isolated_bronze(
        {
            "de": lambda: synthetic_measurements(spark, n=10),
            "luchtmeetnet": broken,
            "gios": lambda: synthetic_measurements(spark, n=5),
        }
    )
    assert len(frames) == 2
    assert set(errors) == {"luchtmeetnet"}
    assert "api down" in errors["luchtmeetnet"]
    # surviving sources still produce a full cycle
    result = P.silver_measurements(frames, _stations(spark), _cursors(spark))
    assert result.payload.count() > 0


def test_settings_from_env():
    from airquality_data_pipeline_spark.config import Settings

    s = Settings.from_env({})
    assert s.sleep_seconds == 300 and not s.live_api and s.pl_only_auto
    assert s.trigger == {"processingTime": "300 seconds"}

    s2 = Settings.from_env(
        {
            "PIPELINE_SLEEP_SECONDS": "60",
            "PIPELINE_LIVE_API": "true",
            "PIPELINE_DISABLE_NL": "1",
            "PIPELINE_PL_ONLY_AUTO": "no",
            "KAFKA_TOPIC": "aq.test",
            "PIPELINE_RETENTION_DAYS": "3",
        }
    )
    assert s2.sleep_seconds == 60 and s2.live_api and s2.disable_nl
    assert not s2.pl_only_auto
    assert s2.kafka_topic == "aq.test" and s2.retention_days == 3


def test_rest_datasource_end_to_end(spark):
    """The custom Python DataSource through the real read path:
    spark.read.format('rest_measurements') with a pickled fake transport,
    3 page shards fetching in parallel, no page overlap."""
    rows = [
        {"station_id": f"s{i}", "pollutant": "pm25", "value": float(i),
         "timestamp": f"2024-01-01T00:{i % 60:02d}:00Z"}
        for i in range(55)
    ]
    transport = rest.fake_transport_from_rows(rows, page_size=10)
    spark.dataSource.register(rest.RestMeasurementsSource)
    df = (
        spark.read.format("rest_measurements")
        .option("transport_pickle", rest.transport_option(transport))
        .option("base_url", "fake://api")
        .option("max_pages", "6")
        .option("num_shards", "3")
        .load()
    )
    got = df.collect()
    assert len(got) == 55  # every page exactly once across shards
    assert {r.station_id for r in got} == {f"s{i}" for i in range(55)}
    assert all(r.pollutant == "pm25" for r in got)


def test_rest_requests_transport_live_http(spark):
    """Roadmap gap 1 closed: the requests-backed transport_factory
    drives the DataSource over real HTTP (local server), including a
    one-shot 429 that must be absorbed by the backoff loop
    (reference app/main.py:472-481)."""
    import http.server
    import json as _json
    import threading
    from urllib.parse import parse_qs, urlparse

    rows = [
        {"station_id": f"h{i}", "pollutant": "no2", "value": float(i),
         "timestamp": "2024-03-01T06:00:00Z"}
        for i in range(40)
    ]
    page_size, hits = 10, {"p2_429": 0}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            page = int(parse_qs(urlparse(self.path).query).get("page", ["1"])[0])
            if page == 2 and hits["p2_429"] == 0:
                hits["p2_429"] += 1
                self.send_response(429)
                self.end_headers()
                return
            start = (page - 1) * page_size
            body = _json.dumps(
                {"data": rows[start : start + page_size], "last_page": 4}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        spark.dataSource.register(rest.RestMeasurementsSource)
        df = (
            spark.read.format("rest_measurements")
            .option(
                "transport_factory",
                "airquality_data_pipeline_spark.sources.rest:"
                "requests_transport_factory",
            )
            .option("base_url", f"http://127.0.0.1:{srv.server_address[1]}/m")
            .option("max_pages", "4")
            .option("num_shards", "2")
            .option("backoff_step_s", "0.05")
            .load()
        )
        got = df.collect()
        assert len(got) == 40
        assert {r.station_id for r in got} == {f"h{i}" for i in range(40)}
        assert hits["p2_429"] == 1  # the 429 was served once and retried
    finally:
        srv.shutdown()


def test_kafka_wire_roundtrip(spark):
    """K1 both directions: producer side serializes to_json(struct(*));
    the consumer side must recover the canonical record exactly with
    from_json on the declared schema."""
    from pyspark.sql import functions as F

    from airquality_data_pipeline_spark.io import MEASUREMENT_SCHEMA

    bronze = synthetic_measurements(spark, n=25)
    wire = pipeline.kafka_payload(bronze)
    decoded = wire.select(
        F.from_json(F.col("value"), MEASUREMENT_SCHEMA).alias("m")
    ).select("m.*")
    orig = sorted(map(tuple, bronze.collect()))
    back = sorted(map(tuple, decoded.collect()))
    assert orig == back
