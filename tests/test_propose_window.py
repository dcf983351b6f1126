"""The round-N+1 driver-window proposer (scripts/propose_window.py):
the rotation that accumulates driver attestation across rounds must
propose valid, deduplicated, never-windowed-first windows."""

import json
import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)


def test_proposed_window_shape():
    import __spark_entry__ as e
    from propose_window import N_OPS, N_RELATIONAL, propose

    window, next_round = propose()
    assert len(window) == N_RELATIONAL + N_OPS
    assert len(set(window)) == len(window)  # no duplicates
    registry = set(e.queries())
    assert set(window) <= registry
    assert sum(1 for n in window if n.startswith("op_")) == N_OPS

    # next round is one past the newest ledger round
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "DRIVER_WINDOWS.json")) as f:
        ledger = {k: v for k, v in json.load(f).items() if k.startswith("r")}
    assert next_round == max(int(k[1:]) for k in ledger) + 1

    # never-windowed ops take strict priority: while never-windowed
    # entries remain unproposed, no already-windowed op may be picked
    windowed_ever = {n for v in ledger.values() for n in v}
    ops_all = {n for n in registry if n.startswith("op_")}
    never = ops_all - windowed_ever
    picked_ops = [n for n in window if n.startswith("op_")]
    if len(never) >= N_OPS:
        assert set(picked_ops) <= never
    else:
        assert never <= set(picked_ops)


def test_proposed_ops_spread_across_families():
    """The family spread is guaranteed only while the never-windowed
    pool can fill the window; once future rounds drain it, propose()
    falls back to least-recently-windowed order with no spread
    contract — so the live-ledger assertion is conditional (the
    unconditional round-robin property is tested synthetically below)."""
    import json

    import __spark_entry__ as e
    from propose_window import N_OPS, _family, propose

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "DRIVER_WINDOWS.json")) as f:
        ledger = {k: v for k, v in json.load(f).items() if k.startswith("r")}
    windowed_ever = {n for v in ledger.values() for n in v}
    never = {
        n for n in e.queries() if n.startswith("op_")
    } - windowed_ever

    window, _ = propose()
    picked_ops = [n for n in window if n.startswith("op_")]
    fams = {_family(n) for n in picked_ops}
    if len(never) >= N_OPS:
        # round-robin must touch many families, not drain one
        # alphabetically
        assert len(fams) >= min(N_OPS, 15)
    else:
        # drained pool: only the leftover never-windowed entries are
        # still owed priority
        assert never <= set(picked_ops)


def test_round_robin_spread_on_synthetic_ledger(monkeypatch):
    """With an EMPTY ledger every op is never-windowed, so the
    round-robin guarantee is unconditional: the picked ops must span
    many families regardless of how future rounds mutate the real
    DRIVER_WINDOWS.json."""
    import propose_window
    from propose_window import N_OPS, _family

    monkeypatch.setattr(propose_window, "_ledger", lambda: {"r0": []})
    window, next_round = propose_window.propose()
    assert next_round == 1
    picked_ops = [n for n in window if n.startswith("op_")]
    assert len(picked_ops) == N_OPS
    fams = {_family(n) for n in picked_ops}
    assert len(fams) >= min(N_OPS, 15)


def test_active_driver_window_is_valid_and_ledgered():
    """The ACTIVE window in __spark_entry__._DRIVER_WINDOW (not just
    the proposer's output) must be 50 deduplicated registry names —
    a typo'd entry silently drops out of the windowed head (``if k in
    full``), wasting a driver slot — every entry must carry an oracle
    (driver rows should be hash-attested, never rows-only), and the
    newest DRIVER_WINDOWS.json ledger round must record exactly this
    window, since never-windowed accounting and COVERAGE.md claims
    derive from the ledger."""
    import __spark_entry__ as e

    window = e._DRIVER_WINDOW
    assert len(window) == 50
    assert len(set(window)) == 50
    registry = e.queries()
    missing = [n for n in window if n not in registry]
    assert not missing, f"window names absent from registry: {missing}"
    sqls = e.oracle_sql()
    unhashed = [n for n in window if n not in sqls]
    assert not unhashed, f"window entries without an oracle: {unhashed}"

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "DRIVER_WINDOWS.json")) as f:
        ledger = {k: v for k, v in json.load(f).items() if k.startswith("r")}
    newest = max(ledger, key=lambda k: int(k[1:]))
    assert ledger[newest] == window, (
        f"ledger {newest} does not match the active _DRIVER_WINDOW"
    )

    # the windowed head must actually lead the queries() dict order —
    # the driver samples a prefix, so any reordering bug breaks the
    # attestation plan silently
    assert list(registry)[: len(window)] == window
