"""Expectation operators (O11): data-quality gates as control flow.

The reference enforces correctness with inline ``raise``/``assert``
inside task bodies (e.g. dags/DNS_Requests.py:85-95,
dags/Speedtest.py:91-96, dags/Backups.py:95-101). Here the same
semantics are library operators over DataFrames: build a *violations*
DataFrame declaratively, and fail the task (→ retry → notify) if it is
non-empty. Violations are computed with ``isEmpty()``/``limit`` so the
check never materializes more than a sample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


class ExpectationFailed(AssertionError):
    """A data-quality expectation failed; carries a violation sample."""

    def __init__(self, message: str, sample: list | None = None):
        self.sample = sample or []
        detail = f" sample={self.sample[:5]!r}" if self.sample else ""
        super().__init__(f"{message}{detail}")


def expect_empty(violations: DataFrame, message: str, sample_rows: int = 5) -> None:
    """Fail if the violations frame has any row (universal quantifier:
    'ALL rows satisfy P' ⇔ 'violations of P are empty' — A3 analog,
    dags/Backups.py:93-101)."""
    sample = violations.limit(sample_rows).collect()
    if sample:
        raise ExpectationFailed(message, [r.asDict() for r in sample])


def expect_nonempty(df: DataFrame, message: str) -> None:
    """Fail if empty (A5 analog: 'no devices configured' errors,
    dags/Speedtest.py:43-44, dags/Backups.py:48-49)."""
    if df.isEmpty():
        raise ExpectationFailed(message)


def expect_that(df: DataFrame, predicate: Column, message: str) -> None:
    """Fail unless every row satisfies ``predicate``."""
    expect_empty(df.where(~predicate), message)


def expect_schema(df: DataFrame, required: dict[str, str], message: str = "") -> None:
    """Fail unless every required column exists with the given type
    (P6 analog: runtime key-presence validation,
    dags/DNS_Requests.py:63-75 — here enforced at the schema boundary)."""
    have = dict(df.dtypes)
    problems = {
        col: f"expected {typ}, have {have.get(col, 'MISSING')}"
        for col, typ in required.items()
        if have.get(col) != typ
    }
    if problems:
        raise ExpectationFailed(message or f"schema mismatch: {problems}")
