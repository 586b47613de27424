"""Driver-contract invariants (round-4, VERDICT r3 'What's wrong' #1/#2).

The driver records rows+schema+hash per queries() entry against its
oracle_sql() — a single oracle-less registration zeroed the whole
CORRECTNESS_r03.json. These tests keep the contract fail-closed locally so
that class of drift can never pass pytest again. Pure-Python: no Spark
session needed (queries() only builds a dict of callables).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def test_driver_hooks_exist():
    assert callable(entrymod.entry)
    assert callable(entrymod.queries)
    assert callable(entrymod.oracle_sql)


def test_every_query_has_an_oracle():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert q, "queries() is empty"
    missing = sorted(q - o)
    assert not missing, f"queries() entries with NO oracle_sql(): {missing}"


def test_no_orphan_oracles():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    orphans = sorted(o - q)
    assert not orphans, f"oracle_sql() entries with no queries() entry: {orphans}"


def test_record_first_names_resolve():
    q = set(entrymod.queries())
    stale = sorted(set(entrymod._RECORD_FIRST) - q)
    assert not stale, f"_RECORD_FIRST names not registered: {stale}"


def test_all_registrations_well_formed():
    for name, fn in entrymod.queries().items():
        assert callable(fn), name
    for name, sql in entrymod.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip(), name


def test_preflight_script_passes():
    import subprocess

    rc = subprocess.call(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "scripts", "preflight.py")]
    )
    assert rc == 0


RECORD_WINDOW = 50  # the driver records the first 50 registrations


def _recorded_ever() -> set:
    """Union of query names the driver has ever recorded (CORRECTNESS_r*.json)."""
    import glob
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names: set = set()
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            names |= set(json.load(open(p)))
        except Exception:
            pass
    return names


def test_record_first_has_no_duplicates():
    """The list is load-bearing for driver evidence: a duplicate silently
    pushes trailing prioritized names outside the 50-slot window (ADVICE r4)."""
    rf = entrymod._RECORD_FIRST
    dupes = sorted({n for n in rf if rf.count(n) > 1})
    assert not dupes, f"_RECORD_FIRST duplicates: {dupes}"


def test_every_registration_gets_a_driver_verdict():
    """Every queries() entry must either already appear in some recorded
    CORRECTNESS_r*.json artifact or be inside the first-50 window of the
    CURRENT ordering (so it gets recorded this round). Catches the round-3/
    round-4 drift where a new registration landed outside the window and
    never received a driver verdict (ADVICE r4 medium)."""
    ordered = list(entrymod.queries())
    window = set(ordered[:RECORD_WINDOW])
    never = sorted(set(ordered) - _recorded_ever() - window)
    assert not never, (
        f"{len(never)} registrations have never been driver-recorded and are "
        f"outside the current first-{RECORD_WINDOW} window: {never} — "
        "add them to the head of _RECORD_FIRST"
    )
