"""Dump .explain("formatted") for headline queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag-dir-suffix> [name ...]
Writes plans/r12/<query>_<tag>.txt (tag e.g. 'before'/'after').
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import HEADLINE

    import __spark_entry__ as entrymod
    from job_post_similarity_spark.session import get_spark

    spark = get_spark("dump-plans")
    qs = entrymod.queries()
    outdir = os.path.join(REPO, "plans", "r12")
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
