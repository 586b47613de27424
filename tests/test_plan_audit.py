"""Physical-plan regression guard: the scale-critical plan shapes asserted
by scripts/plan_audit.py must hold under pytest too, so a refactor that
silently reintroduces a full-KG shuffle, a row-Python UDF, or an unpruned
scan fails the suite."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

SF_DIR = "/root/testdata/sf0.001"


def test_plan_invariants(spark):
    from plan_audit import run_audit

    results = run_audit(spark, SF_DIR)
    failures = [(n, d) for (n, ok, d) in results if not ok]
    assert not failures, f"plan invariants violated: {failures}"
