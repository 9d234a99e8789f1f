"""Upsert sinks for external keyed stores via foreachBatch.

The reference commits to Postgres with
  INSERT ... ON CONFLICT (station_id) DO UPDATE SET col =
  COALESCE(EXCLUDED.col, old.col)                  (app/main.py:633-648)
  INSERT ... ON CONFLICT ... DO UPDATE SET last_observed_at =
  GREATEST(old, EXCLUDED.last_observed_at)         (app/main.py:263-267)

Spark has no native JDBC MERGE, so the idiomatic home is foreachBatch:
the micro-batch arrives as a DataFrame, is collected per partition (the
batch is dimension-sized — stations/cursors, not the fact stream), and
the SAME conflict SQL executes against the target. Exercised here
against SQLite (stdlib, same ON CONFLICT dialect); a deployment swaps
the connection factory for psycopg/JDBC — the SQL is unchanged.
"""

from __future__ import annotations

import sqlite3
from collections.abc import Callable

from pyspark.sql import DataFrame

STATIONS_DDL = """
CREATE TABLE IF NOT EXISTS stations (
  station_id TEXT PRIMARY KEY,
  source TEXT, country TEXT, city TEXT, location_name TEXT,
  lat REAL, lon REAL
)
"""

CURSORS_DDL = """
CREATE TABLE IF NOT EXISTS ingestion_cursors (
  source TEXT, station_id TEXT, pollutant TEXT,
  last_observed_at TEXT,
  PRIMARY KEY (source, station_id, pollutant)
)
"""

# COALESCE-merge: never overwrite a non-null value with null
STATIONS_UPSERT = """
INSERT INTO stations (station_id, source, country, city, location_name, lat, lon)
VALUES (?, ?, ?, ?, ?, ?, ?)
ON CONFLICT (station_id) DO UPDATE SET
  source        = COALESCE(excluded.source, stations.source),
  country       = COALESCE(excluded.country, stations.country),
  city          = COALESCE(excluded.city, stations.city),
  location_name = COALESCE(excluded.location_name, stations.location_name),
  lat           = COALESCE(excluded.lat, stations.lat),
  lon           = COALESCE(excluded.lon, stations.lon)
"""

# GREATEST-merge: cursors only ever advance (ISO-8601 text compares
# lexicographically = chronologically)
CURSORS_UPSERT = """
INSERT INTO ingestion_cursors (source, station_id, pollutant, last_observed_at)
VALUES (?, ?, ?, ?)
ON CONFLICT (source, station_id, pollutant) DO UPDATE SET
  last_observed_at = MAX(ingestion_cursors.last_observed_at,
                         excluded.last_observed_at)
"""


def upsert_catalog_batch(
    db_path: str, batch: DataFrame, connect: Callable = sqlite3.connect
) -> int:
    """K2: COALESCE-merge one micro-batch of station rows. Returns the
    number of rows applied."""
    rows = [
        (r.station_id, r.source, r.country, r.city, r.location_name, r.lat, r.lon)
        for r in batch.select(
            "station_id", "source", "country", "city", "location_name", "lat", "lon"
        ).collect()
    ]
    with connect(db_path) as con:
        con.execute(STATIONS_DDL)
        con.executemany(STATIONS_UPSERT, rows)
    return len(rows)


def commit_cursor_batch(
    db_path: str, updates: DataFrame, source: str,
    connect: Callable = sqlite3.connect,
) -> int:
    """K3: GREATEST-merge pending cursor updates. Call AFTER the payload
    emit succeeds (reference app/main.py:1342-1347)."""
    rows = [
        (source, r.station_id, r.pollutant, str(r.last_observed_at))
        for r in updates.select(
            "station_id", "pollutant", "last_observed_at"
        ).collect()
    ]
    with connect(db_path) as con:
        con.execute(CURSORS_DDL)
        con.executemany(CURSORS_UPSERT, rows)
    return len(rows)


def load_cursors(db_path: str, source: str, spark, connect: Callable = sqlite3.connect):
    """S10: cursor-state scan back into a DataFrame for the next cycle."""
    with connect(db_path) as con:
        con.execute(CURSORS_DDL)
        rows = con.execute(
            "SELECT station_id, pollutant, last_observed_at "
            "FROM ingestion_cursors WHERE source = ?",
            (source,),
        ).fetchall()
    return spark.createDataFrame(
        rows or [], "station_id string, pollutant string, last_observed_at string"
    )
