"""Driver-window rotation report (r15 verdict #9): make the per-round
"stalest cohort" claim a committed table instead of a hand-curated
list.

For every query in the registry, emit:

- ``last_green_round``: the newest ``CORRECTNESS_r*.json`` carrying a
  clean record for it (hash-green, or rows-only with spark_rows > 0
  and no error), i.e. the query's driver provenance;
- ``rounds_stale``: current round minus that;
- ``oracle``: whether the query carries DuckDB SQL (hash-checkable)
  or is rows-only;
- ``in_window``: whether the current ``queries()`` ordering puts it
  inside the driver's 50-slot window;
- ``src_hash``: sha256 of the query callable's source + its oracle
  SQL. The report file is committed, so NEXT round's run can diff
  hashes against the previous report and flag ``changed_since_green``
  mechanically (a query whose code changed after its last driver
  record needs re-seating regardless of staleness).

Usage: ``python tools/window_report.py [--window-size 50]`` — prints
the table and rewrites ``WINDOW_REPORT.json`` at the repo root.
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import inspect
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _clean_record(rec: dict) -> bool:
    if rec.get("hash_match") is True:
        return True
    # rows-only record: the driver marks these err='no_oracle';
    # clean = the Spark side ran and produced rows
    if rec.get("err") not in (None, "no_oracle"):
        return False
    return (
        rec.get("hash_match") is None and (rec.get("spark_rows") or 0) > 0
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window-size", type=int, default=50)
    args = ap.parse_args()

    import __spark_entry__ as entry

    qmap = entry.queries()
    osql = entry.oracle_sql()
    ordered = list(qmap)  # registry order == window order

    last_green: dict[str, int] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        try:
            data = json.load(open(path))
        except Exception:  # noqa: BLE001 — a malformed artifact is skipped
            continue
        for name, rec in data.items():
            if isinstance(rec, dict) and _clean_record(rec):
                last_green[name] = max(last_green.get(name, 0), rnd)
    current_round = max(rounds) if rounds else 0

    prev_hashes: dict[str, str] = {}
    report_path = os.path.join(REPO, "WINDOW_REPORT.json")
    if os.path.exists(report_path):
        try:
            prev = json.load(open(report_path))
            prev_hashes = {
                q["query"]: q["src_hash"] for q in prev.get("queries", [])
            }
        except Exception:  # noqa: BLE001
            pass

    out = []
    for i, name in enumerate(ordered):
        try:
            src = inspect.getsource(qmap[name])
        except Exception:  # noqa: BLE001 — builtins/partials
            src = repr(qmap[name])
        h = hashlib.sha256(
            (src + (osql.get(name) or "")).encode()
        ).hexdigest()[:16]
        lg = last_green.get(name, 0)
        out.append(
            {
                "query": name,
                "oracle": name in osql,
                "last_green_round": lg or None,
                "rounds_stale": (current_round - lg) if lg else None,
                "in_window": i < args.window_size,
                "src_hash": h,
                "changed_since_prev_report": (
                    prev_hashes.get(name) is not None
                    and prev_hashes[name] != h
                ),
            }
        )

    doc = {
        "as_of_round": current_round,
        "window_size": args.window_size,
        "queries": out,
    }
    with open(report_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)

    never = [q for q in out if q["last_green_round"] is None]
    stale = sorted(
        (q for q in out if q["rounds_stale"] is not None),
        key=lambda q: -q["rounds_stale"],
    )
    changed = [q for q in out if q["changed_since_prev_report"]]
    print(f"registry: {len(out)} queries ({sum(q['oracle'] for q in out)} "
          f"oracle-bearing); driver window: first {args.window_size}")
    print(f"never driver-recorded: {len(never)}")
    for q in never[:20]:
        print(f"  NEVER  {q['query']}")
    print("stalest driver records:")
    for q in stale[:25]:
        print(f"  r{q['last_green_round']:>2}  stale={q['rounds_stale']:>2}"
              f"  {'win' if q['in_window'] else '   '}  {q['query']}")
    if changed:
        print("changed since previous committed report (re-seat these):")
        for q in changed:
            print(f"  CHANGED  {q['query']}")
    print(f"wrote {report_path}")


if __name__ == "__main__":
    main()
