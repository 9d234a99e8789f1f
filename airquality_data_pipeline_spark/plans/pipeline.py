"""The reference's producer cycle (SURVEY.md §3.1, app/main.py:1213-1354)
as one declarative batch plan:

  per-source bronze frames -> ragged unionByName -> null-value filter ->
  pollutant normalization -> broadcast catalog enrichment (J1) ->
  incremental cursor filter with malformed passthrough (F5/J3) ->
  deterministic first-wins dedup (A4) -> Kafka-shaped JSON payload (K1),
  pending cursor updates committed only after a successful emit (K3).

Every stage is a stock DataFrame op; Catalyst fuses the filters and
projections into the scans, the catalog join broadcasts, and the only
shuffles are the cursor-update aggregate and the dedup window.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airquality_data_pipeline_spark.functions.strings import (
    is_allowed_pollutant,
    normalize_pollutant,
)
from airquality_data_pipeline_spark.operators.cursor import (
    greatest_merge,
    incremental_filter,
)
from airquality_data_pipeline_spark.operators.dedup import first_wins_dedup


@dataclass
class CycleResult:
    payload: DataFrame          # deduped canonical records, enriched
    pending_cursors: DataFrame  # max ts per key, to commit post-emit


def isolated_bronze(
    sources: dict[str, object],
) -> tuple[list[DataFrame], dict[str, str]]:
    """Per-source fault isolation (reference app/main.py:1219-1248,
    1266-1318: one country failing never kills the cycle). Each entry is
    a zero-arg callable producing that source's bronze frame; failures
    are collected, survivors proceed. Build-time errors (fetch, parse,
    schema) are caught here; for action-time isolation run each source
    as its own query/foreachBatch, which this structure permits."""
    frames: list[DataFrame] = []
    errors: dict[str, str] = {}
    for name, build in sources.items():
        try:
            frames.append(build())
        except Exception as exc:  # noqa: BLE001 - isolation is the point
            errors[name] = f"{type(exc).__name__}: {exc}"
    return frames, errors


def canonical_union(frames: list[DataFrame]) -> DataFrame:
    """P1: merge heterogeneous per-source frames; missing columns
    null-fill (synthetic/OpenAQ rows lack lat/lon, SURVEY.md §1.2)."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def silver_measurements(
    bronze_frames: list[DataFrame],
    stations: DataFrame,
    cursors: DataFrame,
) -> CycleResult:
    """Bronze -> silver: the full cycle minus the sinks."""
    raw = canonical_union(bronze_frames)
    # F1: drop null readings (reference app/main.py:752-753, 1130-1131)
    # F4: normalize + allowlist pollutant codes (app/main.py:1045-1056)
    clean = (
        raw.where(F.col("value").isNotNull())
        .withColumn("pollutant", normalize_pollutant("pollutant"))
        .where(is_allowed_pollutant("pollutant"))
    )
    # J1: broadcast station enrichment (app/main.py:651-695 lookup caches)
    dim = F.broadcast(
        stations.select(
            "station_id",
            F.col("city").alias("_cat_city"),
            F.col("location_name").alias("_cat_location_name"),
            F.col("lat").alias("_cat_lat"),
            F.col("lon").alias("_cat_lon"),
        )
    )
    enriched = (
        clean.join(dim, "station_id", "left")
        .withColumn("city", F.coalesce("city", "_cat_city"))
        .withColumn("location_name", F.coalesce("location_name", "_cat_location_name"))
        .withColumn("lat", F.coalesce("lat", "_cat_lat"))
        .withColumn("lon", F.coalesce("lon", "_cat_lon"))
        .drop("_cat_city", "_cat_location_name", "_cat_lat", "_cat_lon")
    )
    # F5/J3: incremental high-watermark filter + pending updates
    fresh, pending = incremental_filter(
        enriched,
        cursors,
        keys=("station_id", "pollutant"),
        ts_col="timestamp",
    )
    # A4: first-wins dedup on the composite key, deterministic order
    deduped = first_wins_dedup(
        fresh,
        keys=["station_id", "pollutant", "timestamp"],
        order_by=["source"],
    )
    return CycleResult(payload=deduped, pending_cursors=pending)


def kafka_payload(df: DataFrame) -> DataFrame:
    """K1: Kafka-shaped JSON frame — key = station_id (keeps one
    station's readings in one partition), value = full record."""
    return df.select(
        F.col("station_id").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )


def commit_cursors(cursors: DataFrame, pending: DataFrame) -> DataFrame:
    """K3: GREATEST-merge commit — call only after the emit action has
    succeeded (reference app/main.py:1342-1347 commits in the `else`
    branch of the try/except around the Kafka send)."""
    return greatest_merge(
        cursors, pending, keys=("station_id", "pollutant"), ts_col="last_observed_at"
    )
