"""Snapshot-versioned parquet tables: write-once versions + an
atomically-swapped manifest — the minimal Delta/Iceberg-shaped
time-travel layer over plain parquet.

Layout:

    table_dir/
      manifest.json        {"current": 3, "versions": {"1": {...}, ...}}
      v=1/  v=2/  v=3/     immutable parquet snapshot directories

Writers never mutate a committed snapshot: a new version directory is
fully written FIRST, then the manifest is swapped via the move-aside
rename pattern (``compact_files``' crash-safety argument: a reader
either sees the old manifest or the new one, never a torn state; a
crash before the swap leaves an orphan ``v=N`` directory that the next
write garbage-collects). Readers resolve the manifest once and then
read an immutable directory — so long-running jobs are isolated from
concurrent writers (snapshot isolation, single-writer assumption).

At 100 TB the same design holds — the manifest is KB-sized regardless
of table size — but a real multi-writer lake needs a lock service or
a log-structured commit protocol (Delta's optimistic log / Iceberg's
catalog swap); documented out of scope.
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "manifest.json"


def _load_manifest(table_dir: str) -> dict:
    p = os.path.join(table_dir, _MANIFEST)
    if not os.path.exists(p):
        return {"current": 0, "versions": {}}
    with open(p) as f:
        return json.load(f)


def write_version(
    df: DataFrame, table_dir: str, note: str | None = None
) -> int:
    """Commit ``df`` as the next snapshot version; returns the new
    version number. The snapshot directory is complete before the
    manifest swap, so a crash at any point leaves the previous
    version readable."""
    os.makedirs(table_dir, exist_ok=True)
    man = _load_manifest(table_dir)
    new_v = man["current"] + 1
    vdir = os.path.join(table_dir, f"v={new_v}")
    if os.path.exists(vdir):  # orphan from a crashed writer: GC it
        shutil.rmtree(vdir)
    df.write.mode("errorifexists").parquet(vdir)
    man["current"] = new_v
    man["versions"][str(new_v)] = {
        "committed_at": datetime.now(timezone.utc).isoformat(),
        "note": note,
        "n_files": sum(
            1 for f in os.listdir(vdir) if f.endswith(".parquet")
        ),
    }
    tmp = os.path.join(table_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(man, f, indent=2)
    os.replace(tmp, os.path.join(table_dir, _MANIFEST))
    return new_v


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read a committed snapshot — latest by default, or time-travel
    to an explicit ``version``."""
    man = _load_manifest(table_dir)
    v = man["current"] if version is None else version
    if v < 1 or str(v) not in man["versions"]:
        raise ValueError(
            f"version {version!r} not committed in {table_dir}"
            f" (current: {man['current']})"
        )
    return spark.read.parquet(os.path.join(table_dir, f"v={v}"))


def list_versions(table_dir: str) -> list[dict]:
    """Version history, oldest first: (version, committed_at, note,
    n_files) dicts."""
    man = _load_manifest(table_dir)
    return [
        {"version": int(v), **meta}
        for v, meta in sorted(
            man["versions"].items(), key=lambda kv: int(kv[0])
        )
    ]


def vacuum(table_dir: str, keep_last: int = 2) -> list[int]:
    """Drop snapshot directories older than the last ``keep_last``
    committed versions (manifest entries removed in the same swap);
    returns the dropped version numbers. The current version can
    never be dropped."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    man = _load_manifest(table_dir)
    versions = sorted(int(v) for v in man["versions"])
    drop = versions[:-keep_last] if len(versions) > keep_last else []
    for v in drop:
        man["versions"].pop(str(v), None)
    tmp = os.path.join(table_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(man, f, indent=2)
    os.replace(tmp, os.path.join(table_dir, _MANIFEST))
    # directories go AFTER the manifest swap: a reader holding the
    # old manifest could still be scanning them mid-swap, and a crash
    # here leaves only unreferenced directories (GC'd on next write)
    for v in drop:
        vdir = os.path.join(table_dir, f"v={v}")
        if os.path.exists(vdir):
            shutil.rmtree(vdir)
    return drop


def optimize_version(
    spark: "SparkSession",  # noqa: F821
    table_dir: str,
    zorder_by: "tuple[str, str] | None" = None,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """OPTIMIZE for versioned tables: rewrite the CURRENT snapshot as
    a new compacted version — optionally Z-ORDER clustered on two
    columns (``sources.io.write_zordered``'s Morton key) so scans
    filtered on either column prune files. The Delta ``OPTIMIZE …
    ZORDER BY`` shape, expressed as an append-only snapshot commit:
    readers of the old version are untouched, and ``vacuum`` reclaims
    it later. Returns the new version number.
    """
    import math
    import os

    from pyspark.sql import functions as F

    from .io import morton_key

    df = read_version(spark, table_dir)
    man = _load_manifest(table_dir)
    vdir = os.path.join(table_dir, f"v={man['current']}")
    size = sum(
        os.path.getsize(os.path.join(vdir, f))
        for f in os.listdir(vdir)
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(size / target_bytes))
    if zorder_by is not None:
        a, b = zorder_by
        df = (
            df.withColumn("__z", morton_key(a, b))
            .repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    else:
        df = df.repartition(n_files)
    note = (
        f"optimize zorder={zorder_by}" if zorder_by else "optimize compact"
    )
    return write_version(df, table_dir, note=note)
