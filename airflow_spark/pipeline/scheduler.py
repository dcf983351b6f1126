"""Cron scheduling with catchup=False semantics (O7/O8).

A minimal 5-field cron matcher (minute hour dom month dow, supporting
``*``, lists, ranges, ``*/n`` steps, and the ``@hourly/@daily/@weekly``
aliases the reference uses) plus a driver loop that, per pipeline,
runs **only the latest** missed interval — the reference's
``catchup=False`` posture (all 6 DAGs, e.g. dags/DNS_Requests.py:26):
no backfill storms after downtime.

Scheduling is deliberately driver-side and thin: each fire is one
``pipeline.run`` (one batch of Spark jobs). Streaming-trigger analogs
live in ``airflow_spark.streaming``.
"""

from __future__ import annotations

import datetime as dt
import logging
import time
from dataclasses import dataclass, field

logger = logging.getLogger("airflow_spark.scheduler")

ALIASES = {
    "@hourly": "0 * * * *",
    "@daily": "0 0 * * *",
    "@weekly": "0 0 * * 0",
    "@monthly": "0 0 1 * *",
}


def _parse_field(spec: str, lo: int, hi: int) -> set[int]:
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
        if part in ("*", ""):
            lo_p, hi_p = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            lo_p, hi_p = int(a), int(b)
        else:
            lo_p = hi_p = int(part)
        out.update(range(lo_p, hi_p + 1, step))
    # dow 7 is the standard-cron Sunday alias
    if hi == 6 and 7 in out:
        out.discard(7)
        out.add(0)
    # silently discarding out-of-range values would make a typo like
    # minute 60 — or '* * * * 7' without the alias — never fire at all
    bad = {v for v in out if not lo <= v <= hi}
    if bad:
        raise ValueError(
            f"cron field value(s) {sorted(bad)} outside [{lo}, {hi}]"
        )
    return out


def cron_matches(expr: str, when: dt.datetime) -> bool:
    """True if ``when`` (minute precision) matches the cron expression."""
    expr = ALIASES.get(expr.strip(), expr.strip())
    fields = expr.split()
    if len(fields) != 5:
        raise ValueError(f"invalid cron {expr!r}")
    minute, hour, dom, month, dow = fields
    return (
        when.minute in _parse_field(minute, 0, 59)
        and when.hour in _parse_field(hour, 0, 23)
        and when.day in _parse_field(dom, 1, 31)
        and when.month in _parse_field(month, 1, 12)
        # cron dow: 0=Sunday; Python weekday(): 0=Monday
        and ((when.weekday() + 1) % 7) in _parse_field(dow, 0, 6)
    )


def next_fire(expr: str, after: dt.datetime, horizon_days: int = 366) -> dt.datetime:
    """First matching minute strictly after ``after``."""
    t = after.replace(second=0, microsecond=0) + dt.timedelta(minutes=1)
    end = after + dt.timedelta(days=horizon_days)
    while t <= end:
        if cron_matches(expr, t):
            return t
        t += dt.timedelta(minutes=1)
    raise ValueError(f"no fire time within {horizon_days}d for {expr!r}")


def latest_fire_in(
    expr: str, start: dt.datetime, end: dt.datetime
) -> dt.datetime | None:
    """Most recent matching minute in (start, end] — the single
    interval catchup=False executes after downtime."""
    t = end.replace(second=0, microsecond=0)
    while t > start:
        if cron_matches(expr, t):
            return t
        t -= dt.timedelta(minutes=1)
    return None


@dataclass
class _Entry:
    pipeline: object
    run_kwargs: dict = field(default_factory=dict)
    last_fire: dt.datetime | None = None
    #: dataset-driven trigger (Airflow Datasets analog): when set, the
    #: pipeline also fires on dataset change, independent of the cron
    dataset: object | None = None


class Scheduler:
    """Thin driver loop: poll the clock, fire due pipelines."""

    def __init__(self, spark):
        self.spark = spark
        self.entries: dict[str, _Entry] = {}

    def register(self, pipeline, dataset=None, **run_kwargs) -> None:
        """``dataset`` (a ``sensors.DatasetTrigger``) makes the
        pipeline data-driven: it fires when the watched path's
        fingerprint changes — with no cron, that is its ONLY trigger;
        with one, both fire it (cron for freshness, dataset for
        upstream pushes)."""
        if pipeline.schedule is None and dataset is None:
            raise ValueError(
                f"pipeline {pipeline.name} has no schedule and no dataset"
            )
        self.entries[pipeline.name] = _Entry(
            pipeline, run_kwargs, dataset=dataset
        )

    def run_pending(self, now: dt.datetime | None = None) -> list:
        """Fire every pipeline whose latest due interval since its last
        fire is unexecuted (catchup=False: at most ONE run per pipeline
        per poll, at the latest missed fire time)."""
        now = now or dt.datetime.now(dt.timezone.utc)
        runs = []
        for entry in self.entries.values():
            p = entry.pipeline
            fire = None
            ds_fp = None
            if p.schedule is not None:
                since = entry.last_fire or (now - dt.timedelta(days=1))
                fire = latest_fire_in(p.schedule, since, now)
            if entry.dataset is not None:
                # peek (don't consume): a dataset-triggered run that
                # fails to start must re-fire next poll, and a cron
                # fire must also absorb the pending data change (the
                # cron run processes the same current data — without
                # this the stale fingerprint double-fires next poll)
                ds_fp = entry.dataset.peek()
            if fire is None and ds_fp is not None:
                fire = now  # data-driven: run AT the poll instant
            if fire is None:
                continue
            entry.last_fire = fire
            logger.info("firing %s for interval %s", p.name, fire)
            try:
                runs.append(p.run(self.spark, run_ts=fire, **entry.run_kwargs))
            except Exception:  # noqa: BLE001
                # one raising pipeline must not starve the others in
                # this poll or kill run_loop; the cron interval stays
                # consumed (at-most-once, catchup=False semantics) but
                # the dataset fingerprint is NOT committed, so a
                # data-driven fire is retried next poll
                logger.exception("pipeline %s raised during run", p.name)
            else:
                if ds_fp is not None:
                    entry.dataset.commit(ds_fp)
        return runs

    def run_loop(self, poll_s: float = 30.0, max_polls: int | None = None) -> None:
        polls = 0
        while max_polls is None or polls < max_polls:
            self.run_pending()
            polls += 1
            time.sleep(poll_s)


def backfill(
    spark,
    pipeline,
    start: dt.datetime,
    end: dt.datetime,
    max_runs: int = 1000,
    **run_kwargs,
) -> list:
    """Explicit backfill: run every cron interval in (start, end] in
    order, each with its interval's ``run_ts`` (deterministic
    reprocessing). catchup=False remains the *default* posture
    (run_pending fires latest-only); backfill is the opt-in manual
    path — bounded by ``max_runs`` to prevent storms."""
    runs = []
    t = start
    while len(runs) < max_runs:
        t = next_fire(pipeline.schedule, t)
        if t > end:
            break
        runs.append(pipeline.run(spark, run_ts=t, **run_kwargs))
    return runs
