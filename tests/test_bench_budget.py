"""Bench budget guard (r13 VERDICT item 7): the r13 graded run hit
the 780 s deadline, watchdog-emitted, and silently shipped five blind
sections — because a new ~90 s training section landed without
re-budgeting the whole run. These tests make that failure a
commit-time error: the COMMITTED builder artifact (BENCH_DETAIL.json,
written by a clean `SPARK_GRAFT_BENCH_COMMIT=1` run at sf0.1) must
prove that a graded driver run fits the deadline in both scratch
states the driver can encounter:

- WARM (the normal case: the builder's graded-SF run pre-warmed the
  per-SF scratch cache, so fixtures and quantizer indexes all reuse):
  projected wall = this run's wall minus whatever builds it paid,
  and it must fit inside 85% of the deadline — margin for the box's
  documented 2-thread-BLAS oscillation;
- COLD (wiped scratch): projected wall = this run's wall plus every
  build it SKIPPED via the cache, bounded by the full deadline (the
  skip gates + watchdog remain the backstop for cold AND degraded).
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEADLINE = float(os.environ.get("SPARK_GRAFT_BENCH_DEADLINE", "780"))


def _detail() -> dict:
    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
        return json.load(f)


def _build_walls(d: dict) -> tuple[float, float]:
    """(paid, skipped) quantizer-build seconds in the committed run:
    `build_cached: false` means this run paid that cold wall;
    `true` means it reused the cache and a cold run would add it."""
    pf = d.get("ann_recall", {}).get("pq_family", {})
    paid = skipped = 0.0
    cached = pf.get("build_cached", {})
    walls = pf.get("wall_sec", {})
    for fam, key in (
        ("flat_pq", "flat_build"),
        ("ivfadc", "ivfadc_build"),
        ("opq", "opq_build"),
        ("sq8", "sq8_build"),
        ("ivfsq8", "ivfsq8_build"),
    ):
        w = float(walls.get(key, 0.0) or 0.0)
        if cached.get(fam):
            skipped += w
        else:
            paid += w
    # r15 m-sweep builds (flat PQ at m in {32, 64}; the base-m entry
    # shares flat_build's wall and is already counted above)
    base_m = str(pf.get("m"))
    for mkey, ent in pf.get("m_sweep_flat_pq", {}).items():
        if mkey == base_m or not isinstance(ent, dict):
            continue
        w = float(ent.get("build_sec", 0.0) or 0.0)
        if ent.get("build_cached"):
            skipped += w
        else:
            paid += w
    an = pf.get("anisotropic", {})
    for fam in ("flat_pq", "opq"):
        w = float(an.get("build_sec", {}).get(fam, 0.0) or 0.0)
        if an.get("build_cached", {}).get(fam):
            skipped += w
        else:
            paid += w
    # every OTHER ensure_index-cached store in the artifact (sparse
    # postings, minhash band store, future additions): any top-level
    # section dict carrying the (build_sec, build_cached) pair joins
    # the debt ledger automatically — the r14 review found the first
    # two were silently missing from the cold projection
    for key, sec in d.items():
        if not isinstance(sec, dict) or "build_cached" not in sec:
            continue
        w = sec.get("build_sec")
        if not isinstance(w, (int, float)):
            continue
        if sec["build_cached"]:
            skipped += float(w)
        else:
            paid += float(w)
    return paid, skipped


def test_committed_run_completed_every_section():
    """The committed artifact must itself be a complete run: normal
    emission (not the watchdog) and zero skipped sections — a partial
    artifact can't budget anything."""
    d = _detail()
    assert d.get("watchdog_emission") is False
    assert not d.get("skipped_sections"), d.get("skipped_sections")
    assert d.get("bench_wall_sec", 0) > 0
    # the graded amplified headline needs all five engine-vs-engine
    # entries (r13 shipped four)
    amp = d.get("scale_amplified", {})
    with_speedup = [
        k
        for k, v in amp.items()
        if isinstance(v, dict)
        and v.get("spark_speedup_over_duckdb") is not None
    ]
    assert len(with_speedup) >= 5, sorted(with_speedup)


def test_projected_graded_run_fits_deadline():
    d = _detail()
    wall = float(d["bench_wall_sec"])
    paid, skipped = _build_walls(d)
    warm = wall - paid
    cold = wall + skipped
    assert warm <= 0.85 * DEADLINE, (
        f"warm-scratch projection {warm:.0f}s exceeds 85% of the "
        f"{DEADLINE:.0f}s deadline - re-budget bench.py before the "
        "graded run"
    )
    assert cold <= DEADLINE, (
        f"cold-scratch projection {cold:.0f}s exceeds the "
        f"{DEADLINE:.0f}s deadline - the skip gates would starve "
        "tail sections on a wiped cache"
    )
