"""Dump .explain("formatted") for headline queries.

Usage: python tools/dump_plans.py [--dir plans/rNN] <tag> [name ...]
Writes <dir>/<query>_<tag>.txt (tag e.g. 'before'/'after'); the
output directory defaults to plans/r13 for the current round.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    outdir = os.path.join(REPO, "plans", "r13")
    if "--dir" in args:
        i = args.index("--dir")
        outdir = args[i + 1]
        del args[i : i + 2]
    tag = args[0]
    names = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import HEADLINE

    import __spark_entry__ as entrymod
    from job_post_similarity_spark.session import get_spark

    spark = get_spark("dump-plans")
    qs = entrymod.queries()
    os.makedirs(outdir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names or HEADLINE:
        df = qs[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(mode)
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(txt)
        print(name, "ok", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
