"""Physical-plan regression guard (VERDICT r5 item 2).

Re-runs the 10-section plan audit behind PLANS.md inside pytest, so a
plan regression — a dimension join falling off broadcast, a filter no
longer pushed into the parquet scan, the pruned top-k reverting to a
global Window — fails the suite instead of waiting for a human to
re-run tools/plan_audit.py. Explain-only: nothing executes, so this
is cheap at any SF. PLANS.md is regenerated as a side effect, keeping
the committed audit in sync with the code that produced it.

The audits plan against sf0.01 (the correctness-gate SF, and the SF
the CLI tool documents in PLANS.md) regardless of the test session's
default fixture dir — broadcast selection reads file-size stats, so
the audited plan must be the one the gate actually runs.
"""

from __future__ import annotations

import pytest


@pytest.mark.parametrize("write_plans", [True])
def test_plan_audits_all_green(spark, write_plans):
    from tools.plan_audit import run_audits

    results = run_audits(
        spark, "/root/testdata/sf0.01", write_plans=write_plans
    )
    assert len(results) >= 10, "audit list shrank — checks were removed"
    failures = [(q, c) for q, c, ok in results if not ok]
    assert not failures, f"plan regressions: {failures}"
