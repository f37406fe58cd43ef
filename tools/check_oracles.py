"""Local replica of the driver's correctness gate — STRICTER than the
driver on purpose.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares row count,
column names, and an order-insensitive value hash built from
TYPE-TAGGED, FULL-PRECISION cell renderings (``repr`` for floats, a
type prefix per cell). Round-1 lesson: a ``%.6g`` float format let 12
DECIMAL-output queries pass locally while the driver (which pipes
results through pandas/float64) hash-failed them all.

Two extra hard rules make "local green ⇒ driver green":

1. Any ``decimal.Decimal`` cell on either side fails the query as
   ``driver-unsafe type`` — Spark DecimalType and DuckDB DECIMAL /
   HUGEINT render engine-dependently once pandas is involved. Final
   projections must emit double/bigint (DuckDB results are fetched via
   Arrow, so HUGEINT surfaces as decimal128 and is caught too).
2. Floats hash by ``repr`` (shortest round-trip, full precision) —
   both engines must produce the bit-identical IEEE double.

Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math
import sys
import time

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize_cell(v) -> str:
    """Type-tagged, full-precision rendering. Two cells hash equal iff
    a pandas/Arrow round-trip on the driver would render them equal:
    ints of any width collapse (the driver hashed Spark int vs DuckDB
    BIGINT equal in round 1), bools/floats/strings/timestamps are
    distinct families, Decimal is tagged so it can never silently
    match a float."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "d:NaN"
        return f"d:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"DEC:{v}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return f"t:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize_cell(x) for x in v) + "]"
    return f"s:{v}"


def _has_decimal(v) -> bool:
    if isinstance(v, decimal.Decimal):
        return True
    if isinstance(v, (list, tuple)):
        return any(_has_decimal(x) for x in v)
    if isinstance(v, dict):
        return any(_has_decimal(x) for x in v.values())
    return False


def find_unsafe(rows: list[tuple], hashed: bool = True) -> str | None:
    """First driver-unsafe cell type in the result, or None — checks
    NESTED values too (a list<decimal> renders just as
    engine-dependently as a top-level Decimal). When ``hashed`` (the
    query has an oracle), list/tuple/dict cells are ALSO unsafe: the
    driver's pandas canonicalization sort_values chokes on
    unhashable list cells (round-4 lesson — 3 gates errored). Emit
    arrays comma-joined as strings instead."""
    for r in rows:
        for i, v in enumerate(r):
            if _has_decimal(v):
                return f"col #{i} contains Decimal ({v!r:.80s})"
            if hashed and isinstance(v, (list, tuple, dict)):
                return (
                    f"col #{i} is a nested list/map ({v!r:.60s}) — "
                    "driver canon can't hash it; array_join to string"
                )
    return None


def value_hash(columns: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(normalize_cell(r[i]) for i in order) for r in rows
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def _duck_rows(con, sql: str) -> tuple[list[str], list[tuple]]:
    """Fetch DuckDB results via Arrow so HUGEINT (arrow decimal128)
    and DECIMAL surface as decimal.Decimal for the unsafe-type check
    instead of silently collapsing to Python int/float."""
    tbl = con.execute(sql).arrow()
    cols = list(tbl.schema.names)
    pyrows = tbl.to_pylist()
    return cols, [tuple(d[c] for c in cols) for d in pyrows]


def main() -> int:
    import duckdb

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from job_post_similarity_spark.session import get_spark

    argv = [a for a in sys.argv[1:] if a != "--pending"]
    with_pending = "--pending" in sys.argv[1:]
    sf_dir = argv[0] if argv else SF_DIR
    only = set(argv[1:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if with_pending:
        # --pending: ALSO grade the oracles staged for the next window
        # rotation (kept out of oracle_sql() so the parked-means-
        # prior-green invariant holds until the driver grades them)
        oracles = {**oracles, **entrymod._PENDING_ORACLES}
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        unsafe = find_unsafe(srows, hashed=name in oracles)
        if unsafe:
            print(f"FAIL {name}: spark output driver-unsafe: {unsafe}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"pass {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            dcols, drows = _duck_rows(con, oracles[name])
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        unsafe = find_unsafe(drows)
        if unsafe:
            print(f"FAIL {name}: oracle output driver-unsafe: {unsafe}")
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema {sorted(scols)} vs {sorted(dcols)}")
        elif value_hash(scols, srows) != value_hash(dcols, drows):
            problems.append("value-hash mismatch")
            sset = {tuple(normalize_cell(c) for c in r) for r in srows}
            dset = {tuple(normalize_cell(c) for c in r) for r in drows}
            for r in list(sset - dset)[:3]:
                print(f"    spark-only: {r}")
            for r in list(dset - sset)[:3]:
                print(f"    duck-only:  {r}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"pass {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
    ran = sum(1 for n in qs if not only or n in only)
    scope = "" if not only else f" (subset of {len(qs)})"
    print(f"\n{ran - len(failures)}/{ran} ok{scope}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
