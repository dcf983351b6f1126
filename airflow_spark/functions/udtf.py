"""UDTF surface (§2.10 'reserved for fan-out generators').

Spark 3.5+ Python UDTFs cover the rare case where one input row must
generate a *variable, logic-driven* number of output rows and no
explode/sequence expression can express the generator. The canonical
example here expands a (key, start, end, step) spec into tick rows —
the kind of driver-side loop the reference writes imperatively
(per-interval checks) made relational.

Policy reminder: prefer ``F.explode(F.sequence(...))`` (pure codegen,
used by ``operators/relational.py:interval_join``) whenever the
generator IS expressible; the UDTF form exists for when it is not.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="key: string, tick: int")
class TickExpander:
    """One row per step in [start, end) per input row — with arbitrary
    Python in the loop body (the part sequence() can't do)."""

    def eval(self, key: str, start: int, end: int, step: int):  # noqa: D102
        if step <= 0:
            return
        t = start
        while t < end:
            yield key, t
            t += step
