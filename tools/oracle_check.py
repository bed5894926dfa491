"""Local mimic of the driver's CORRECTNESS gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and, when an
``oracle_sql()`` entry exists, the same query on DuckDB over the same
parquet tables; compares row count, column-name set, and an
order-insensitive value hash (columns sorted by name, every cell
canonicalized to a string, rows sorted). Queries without oracle SQL
get the weaker rows-only check (must run and return >= 0 rows).

Usage:
    python tools/oracle_check.py [--sf /root/testdata/sf0.01] [--only name,...]
"""

from __future__ import annotations

import argparse
import decimal
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return _canon(float(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{"
            + ",".join(
                f"{_canon(k)}:{_canon(v[k])}" for k in sorted(v, key=str)
            )
            + "}"
        )
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_canon(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\x1e")
    return h.hexdigest()


def check_queries(
    spark, sf: str, only: set[str] | None = None, verbose: bool = True
) -> tuple[dict, int]:
    """Run queries() vs oracle_sql() on DuckDB over ``sf``'s parquet;
    returns (per-query results, n_fail). Reused by the pytest guard in
    tests/test_oracle_window.py so out-of-driver-window regressions
    fail CI, not just the (windowed) driver gate."""
    import duckdb

    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()

    def say(msg: str) -> None:
        if verbose:
            print(msg)

    results = {}
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "SPARK_ERROR", "error": str(e)[:300]}
            n_fail += 1
            say(f"FAIL {name}: SPARK_ERROR {str(e)[:200]}")
            continue
        if name not in oracles:
            results[name] = {
                "status": "ROWS_ONLY",
                "rows": len(srows),
                "sec": round(time.time() - t0, 2),
            }
            n_pass += 1
            say(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "ORACLE_ERROR", "error": str(e)[:300]}
            n_fail += 1
            say(f"FAIL {name}: ORACLE_ERROR {str(e)[:200]}")
            continue
        rows_match = len(srows) == len(orows)
        schema_match = sorted(scols) == sorted(ocols)
        hash_match = (
            rows_match
            and schema_match
            and value_hash(scols, srows) == value_hash(ocols, orows)
        )
        status = "PASS" if (rows_match and schema_match and hash_match) else "FAIL"
        results[name] = {
            "status": status,
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": hash_match,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
            "sec": round(time.time() - t0, 2),
        }
        if status == "PASS":
            n_pass += 1
            say(f"ok   {name}: {len(srows)} rows hash-match")
        else:
            n_fail += 1
            say(
                f"FAIL {name}: rows {len(srows)}/{len(orows)} "
                f"schema={schema_match} hash={hash_match}"
            )
            if verbose and rows_match and schema_match:
                # show a few differing rows to debug
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = {
                    "\x1f".join(_canon(r[i]) for i in order) for r in srows
                }
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                oset = {
                    "\x1f".join(_canon(r[i]) for i in oorder) for r in orows
                }
                for d in list(sset - oset)[:3]:
                    say("   spark-only: " + d[:160])
                for d in list(oset - sset)[:3]:
                    say("   oracle-only: " + d[:160])

    say(f"\n{n_pass} pass / {n_fail} fail")
    con.close()
    return results, n_fail


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from embedding_to_vectordatabase_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    only = set(args.only.split(",")) if args.only else None
    results, n_fail = check_queries(spark, args.sf, only=only)
    with open("/tmp/oracle_check.json", "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
