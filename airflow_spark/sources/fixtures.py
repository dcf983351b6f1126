"""Fixture tables for the reference-DAG parity pipelines (FIXTURES.md
families a1-a11). Each builder returns a DataFrame provider
``Callable[[Context], DataFrame]`` with a PASS-case default and keyword
knobs for every failure mode the reference checks.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import SparkSession
from pyspark.sql import types as T

BASE_TS = dt.datetime(2026, 8, 13, 12, 0, 0)


def _provider(spark: SparkSession, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return lambda ctx: df


def adguard_status(spark, running=True, protection_enabled=True, duration=0):
    """a1 — dict payload of check_protection (dags/DNS_Requests.py:51-95)."""
    schema = T.StructType(
        [
            T.StructField("running", T.BooleanType()),
            T.StructField("protection_enabled", T.BooleanType()),
            T.StructField("protection_disabled_duration", T.LongType()),
        ]
    )
    return _provider(spark, [(running, protection_enabled, duration)], schema)


def adguard_querylog(spark, fresh=("c1", "c2"), stale=(), base_ts=BASE_TS):
    """a2 — newest query-log entry per client (dags/DNS_Requests.py:97-136).
    Fresh clients: 10 min old; stale: 3 h old."""
    rows = [(c, base_ts - dt.timedelta(minutes=10)) for c in fresh]
    rows += [(c, base_ts - dt.timedelta(hours=3)) for c in stale]
    schema = T.StructType(
        [
            T.StructField("client", T.StringType()),
            T.StructField("oldest", T.TimestampType()),
        ]
    )
    return _provider(spark, rows, schema)


def ha_entities(spark, speeds: dict[str, tuple[str, str]] | None = None):
    """a3 — Home-Assistant states (dags/Speedtest.py:59-96). ``speeds``
    maps device → (upload_state, download_state); states are strings
    (tolerant-cast path), e.g. 'unavailable'."""
    speeds = speeds or {"dev1": ("50.5", "200.1")}
    rows = []
    for device, (up, down) in speeds.items():
        rows.append((device, "sensor.speedtest_upload", up))
        rows.append((device, "sensor.speedtest_download", down))
        rows.append((device, "sensor.unrelated", "1.0"))
    return _provider(
        spark, rows, "device string, entity_id string, state string"
    )


def syncthing_health(spark, statuses: dict[str, str] | None = None):
    """a4 — per-device health (dags/Backups.py:53-70)."""
    statuses = statuses or {"nas": "OK", "offsite": "OK"}
    return _provider(
        spark, list(statuses.items()), "device string, status string"
    )


def syncthing_folders(spark, paused_labels=(), labels=("docs", "media")):
    """a5 — folder config array (dags/Backups.py:72-101)."""
    rows = [("nas", lb, lb in paused_labels) for lb in labels]
    return _provider(
        spark, rows, "device string, label string, paused boolean"
    )


def syncthing_folder_stats(spark, fresh=("docs",), stale=(), base_ts=BASE_TS):
    """a6 — folder→lastScan map (dags/Backups.py:103-139). Fresh: 30 min
    old; stale: 5 h old (param default is 2 h)."""
    rows = [("nas", f, base_ts - dt.timedelta(minutes=30)) for f in fresh]
    rows += [("nas", f, base_ts - dt.timedelta(hours=5)) for f in stale]
    schema = T.StructType(
        [
            T.StructField("device", T.StringType()),
            T.StructField("folder", T.StringType()),
            T.StructField("lastScan", T.TimestampType()),
        ]
    )
    return _provider(spark, rows, schema)


def ip_inventory(spark, rows=None):
    """a7 — IP list (dags/Cloudflare_Apps.py:31-48,134-136); ipv6
    nullable."""
    if rows is None:
        rows = [
            ("racknerd", "203.0.113.10", "2001:db8::10"),
            ("iowa", "203.0.113.20", None),
            ("unknown-dc", "203.0.113.30", None),  # unmapped id → skipped
        ]
    return _provider(
        spark, rows, "id string, ipv4_address string, ipv6_address string"
    )


def cloudflare_dns_records(spark, rows=None):
    """a9 — DNS record inventory (plugins/cloudflare/cloudflare_api.py:58-81)."""
    if rows is None:
        rows = [
            ("rec-a-vps", "vps.example.net", "A", "203.0.113.99"),  # drifted
            ("rec-aaaa-vps", "vps.example.net", "AAAA", "2001:db8::10"),  # current
            ("rec-a-iowa", "iowa.example.net", "A", "203.0.113.20"),  # current
        ]
    return _provider(
        spark, rows, "record_id string, name string, type string, content string"
    )


def cloudflare_policies(spark, rows=None):
    """a10 — access policies (plugins/cloudflare/cloudflare_api.py:120-137)."""
    if rows is None:
        rows = [("pol-1", "Default Allow List"), ("pol-2", "Deny All")]
    return _provider(spark, rows, "id string, name string")


def own_ip(spark, ipv6="2001:db8::99"):
    """Cloudflare_DDNS own-address fetch (dags/Cloudflare_DDNS.py:39-46)."""
    return _provider(spark, [(ipv6,)], "ipv6 string")


def files_listing(spark, n_fresh=3, n_expired=2, base_ts=BASE_TS):
    """a11 — filesystem scan rows (dags/Airflow_Cleanup.py:46-54)."""
    rows = [
        (f"/data/fresh_{i}.log", base_ts - dt.timedelta(days=1)) for i in range(n_fresh)
    ]
    rows += [
        (f"/data/old_{i}.log", base_ts - dt.timedelta(days=30))
        for i in range(n_expired)
    ]
    schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("mtime", T.TimestampType()),
        ]
    )
    return _provider(spark, rows, schema)


def disk_usage(spark, used=50, total=100):
    """Disk usage sample (dags/Airflow_Cleanup.py:63-72)."""
    return _provider(
        spark, [(used, total)], "used_bytes bigint, total_bytes bigint"
    )
