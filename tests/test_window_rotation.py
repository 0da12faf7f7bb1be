"""Unit tests for the correctness-window rotation (driver_contract.deferred_queries).

The external driver records CORRECTNESS rows for only the first
CORRECTNESS_WINDOW registrations, so the contract rotates freshly-checked
rows past the window — except FORCE_WINDOW pins, which mark queries whose
implementation changed after their last driver check and must re-verify
this round. Pure-Python: the ledger is monkeypatched, no Spark session.
"""

from mannheimsearchjoinsengine_spark import driver_contract as dc


def _with_ledger(monkeypatch, ledger, force=()):
    monkeypatch.setattr(dc, "last_driver_check", lambda root=None: dict(ledger))
    monkeypatch.setattr(dc, "FORCE_WINDOW", dict(force))


def test_freshest_checked_rows_defer_first(monkeypatch):
    names = tuple(f"q{i}" for i in range(6))
    # q0/q1 checked last round (4), q2/q3 the round before, q4/q5 never
    _with_ledger(monkeypatch, {"q0": 4, "q1": 4, "q2": 3, "q3": 3})
    monkeypatch.setattr(dc, "CORRECTNESS_WINDOW", 4)
    assert dc.deferred_queries(names) == ("q0", "q1")


def test_never_checked_rows_sort_into_window(monkeypatch):
    names = ("new_a", "old_b", "old_c")
    _with_ledger(monkeypatch, {"old_b": 4, "old_c": 2})
    monkeypatch.setattr(dc, "CORRECTNESS_WINDOW", 2)
    # the single deferral slot goes to the most recently checked row,
    # never to the unchecked one
    assert dc.deferred_queries(names) == ("old_b",)


def test_force_window_pin_overrides_recency(monkeypatch):
    names = ("pinned", "plain_a", "plain_b")
    # "pinned" changed in round 5 but was last checked in round 4 — without
    # the pin its recency would defer it
    _with_ledger(monkeypatch, {"pinned": 4, "plain_a": 3, "plain_b": 2},
                 force={"pinned": 5})
    monkeypatch.setattr(dc, "CORRECTNESS_WINDOW", 2)
    assert dc.deferred_queries(names) == ("plain_a",)


def test_force_window_pin_self_clears_after_fresh_check(monkeypatch):
    names = ("pinned", "plain_a", "plain_b")
    # the driver has now recorded the pinned query in round 5 (>= pin round):
    # the pin is inert and plain recency applies again
    _with_ledger(monkeypatch, {"pinned": 5, "plain_a": 3, "plain_b": 2},
                 force={"pinned": 5})
    monkeypatch.setattr(dc, "CORRECTNESS_WINDOW", 2)
    assert dc.deferred_queries(names) == ("pinned",)


def test_rotation_is_self_correcting(monkeypatch):
    """A row deferred this round keeps its old last-check round, so after the
    driver records the in-window rows it outranks them and rotates back in."""
    names = ("a", "b", "c")
    monkeypatch.setattr(dc, "CORRECTNESS_WINDOW", 2)
    _with_ledger(monkeypatch, {"a": 4, "b": 4, "c": 3})
    first = dc.deferred_queries(names)
    assert first == ("a",)
    # round 5 runs: driver checks the window rows (b, c); a keeps round 4
    _with_ledger(monkeypatch, {"a": 4, "b": 5, "c": 5})
    assert dc.deferred_queries(names) == ("b",)  # a is back in the window
