"""One-shot verify battery — the whole driver-facing contract in one
command, in dependency order, stopping at the first red:

1. window invariants (first-50 all oracled; parked oracle gates all
   prior-green) — milliseconds, catches rotation mistakes first;
2. entry() smoke (rows + schema) — what the driver's t1 does;
3. oracle parity at sf0.01 WITH staged oracles — the driver's t2,
   strictly stricter (type-tagged full-precision hash, Decimal and
   nested-cell hard rules);
4. static plan census — unpartitioned-window / cartesian red flags;
5. pytest (full suite);
6. bench at sf0.1 (prints the one JSON line the driver records).

Usage: python tools/verify_all.py [--fast]
  --fast skips pytest and bench (steps 1-4, ~15 min → ~8 min).
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _step(name: str, fn):
    print(f"==> {name}")
    rc = fn()
    if rc:
        print(f"FAILED at: {name}")
        raise SystemExit(rc)
    print(f"    ok: {name}")


def _invariants() -> int:
    import __spark_entry__ as m

    q = list(m.queries())
    o = m.oracle_sql()
    assert len(q) == len(set(q)), "duplicate names"
    missing = [n for n in q[:50] if n not in o]
    assert not missing, f"window gates without oracle: {missing}"
    prior: set = set()
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        prior |= set(json.load(open(f)))
    bad = [n for n in q[50:] if n in o and n not in prior]
    assert not bad, f"oracle-backed parked but never graded: {bad}"
    print(f"    {len(q)} queries, {len(o)} registered oracles")
    return 0


def _entry_smoke() -> int:
    import __spark_entry__ as m
    from job_post_similarity_spark.session import get_spark

    df = m.entry(get_spark("verify-all"))
    rows = df.collect()
    assert rows, "entry() returned 0 rows"
    assert set(df.columns) == {"id1", "id2", "similarity"}, df.columns
    print(f"    entry(): {len(rows)} rows")
    return 0


def _run(args: list[str]) -> int:
    return subprocess.call([sys.executable, *args], cwd=REPO)


def main() -> int:
    fast = "--fast" in sys.argv[1:]
    _step("window invariants", _invariants)
    _step("entry smoke", _entry_smoke)
    _step(
        "oracle parity sf0.01 (+staged)",
        lambda: _run(
            ["tools/check_oracles.py", "/root/testdata/sf0.01", "--pending"]
        ),
    )
    _step(
        "plan census (strict)",
        lambda: _run(["tools/plan_census.py", "--strict"]),
    )
    _step(
        "cache census (strict)",
        lambda: _run(["tools/cache_census.py"]),
    )
    if not fast:
        _step("pytest", lambda: _run(["-m", "pytest", "tests/", "-q"]))
        _step("bench sf0.1", lambda: _run(["bench.py"]))
    print("ALL GREEN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
