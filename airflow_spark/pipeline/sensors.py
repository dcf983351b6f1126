"""Sensors and data-driven triggers (Airflow sensor / Dataset analogs).

A sensor here is a plain task body that pokes a condition on an
interval until it holds or a timeout budget burns — synchronous like
every task in this engine, with the CLOCK injectable so tests (and
deterministic replays) never sleep for real. Built-ins cover the two
conditions the reference's DAGs actually wait on in spirit: a path
existing with data, and an upstream table having advanced past a
high-water mark.

``DatasetTrigger`` is the scheduling-side analog of Airflow Datasets:
instead of (or alongside) a cron, a pipeline fires when a watched
dataset's content fingerprint changes — derived from file
(path, size, mtime) tuples, so the check is a directory listing, no
data read.
"""

from __future__ import annotations

import os
import time as _time
from collections.abc import Callable
from typing import Any

from pyspark.sql import SparkSession


class SensorTimeout(TimeoutError):
    """The condition never held within the sensor's budget."""


def poke_until(
    condition: Callable[[], Any],
    poke_interval_s: float = 30.0,
    timeout_s: float = 600.0,
    clock: Callable[[], float] | None = None,
    sleep: Callable[[float], None] | None = None,
):
    """Poll ``condition`` until it returns a truthy value (returned),
    raising :class:`SensorTimeout` when ``timeout_s`` elapses first.
    ``clock``/``sleep`` are injectable for deterministic tests — the
    same no-wall-clock discipline as ``run_ts``."""
    clock = clock or _time.monotonic
    sleep = sleep or _time.sleep
    deadline = clock() + float(timeout_s)
    while True:
        got = condition()
        if got:
            return got
        if clock() >= deadline:
            raise SensorTimeout(
                f"sensor condition not met within {timeout_s}s"
            )
        sleep(min(poke_interval_s, max(0.0, deadline - clock())))


def path_sensor(
    spark: SparkSession, path: str, min_rows: int = 1
) -> Callable[[], bool]:
    """Condition: ``path`` is readable parquet with ≥ ``min_rows``
    rows (bounded probe — ``limit(min_rows)`` scan, not a count of
    the whole table)."""

    def check() -> bool:
        from pyspark.errors import AnalysisException

        try:
            return (
                len(spark.read.parquet(path).limit(min_rows).take(min_rows))
                >= min_rows
            )
        except AnalysisException:
            return False

    return check


def high_water_sensor(
    spark: SparkSession, path: str, id_col: str, min_id: int
) -> Callable[[], bool]:
    """Condition: the table's max(``id_col``) has reached ``min_id`` —
    "upstream has ingested through X" (footer-friendly: max pushes to
    parquet statistics)."""

    def check() -> bool:
        from pyspark.errors import AnalysisException
        from pyspark.sql import functions as F

        try:
            row = spark.read.parquet(path).agg(F.max(id_col)).first()
        except AnalysisException:
            return False
        return row is not None and row[0] is not None and row[0] >= min_id

    return check


class DatasetTrigger:
    """Dataset-driven scheduling (Airflow Datasets analog): fires when
    the watched path's content fingerprint changes. The fingerprint is
    a hash of sorted (relpath, size, mtime_ns) tuples — a listing walk,
    zero data read, so polling is control-plane cheap."""

    def __init__(self, path: str):
        self.path = path
        self._last: str | None = None

    def fingerprint(self) -> str | None:
        import hashlib

        if not os.path.exists(self.path):
            return None
        entries = []
        if os.path.isfile(self.path):
            try:
                st = os.stat(self.path)
            except FileNotFoundError:
                return None
            entries.append(("", st.st_size, st.st_mtime_ns))
        else:
            for root, dirs, files in os.walk(self.path):
                # skip writer metadata/temp paths (_temporary, _SUCCESS,
                # .crc …): an in-progress Spark write must not change
                # the fingerprint and fire downstream on partial data —
                # the same '_*'-is-hidden convention the parquet
                # readers use
                dirs[:] = [
                    d for d in dirs if not d.startswith(("_", "."))
                ]
                for f in sorted(files):
                    if f.startswith(("_", ".")):
                        continue
                    full = os.path.join(root, f)
                    try:
                        st = os.stat(full)
                    except FileNotFoundError:
                        continue  # racing writer/cleaner: skip, don't die
                    entries.append(
                        (
                            os.path.relpath(full, self.path),
                            st.st_size,
                            st.st_mtime_ns,
                        )
                    )
        if not entries:
            return None  # nothing durable yet: not a fireable dataset
        h = hashlib.sha256(repr(sorted(entries)).encode()).hexdigest()
        return h

    def peek(self) -> str | None:
        """The current fingerprint if it differs from the last
        committed one, else None. Does NOT consume the change — callers
        commit() only once the triggered run has actually been
        recorded, so a run that fails to start is retried next poll."""
        fp = self.fingerprint()
        if fp is None or fp == self._last:
            return None
        return fp

    def commit(self, fp: str) -> None:
        """Mark ``fp`` as processed (the triggered run was recorded)."""
        self._last = fp

    def should_fire(self) -> bool:
        """True when the dataset exists and its fingerprint changed
        since the last commit (first sight of an existing dataset
        fires). Peek-and-commit in one step — the scheduler uses the
        two-phase ``peek``/``commit`` form so a failed run re-fires."""
        fp = self.peek()
        if fp is None:
            return False
        self.commit(fp)
        return True
