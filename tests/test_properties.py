"""Hypothesis property tests for the pure-numpy / pure-expression
cores — fast (no Spark jobs), they pin the algorithmic invariants the
Spark tiers rely on."""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def brute_topk(lids, lmat, rids, rmat, k, include_self):
    """Oracle: plain O(n²) loop with the contract's tie-break."""
    out = []
    for i, (lid, lv) in enumerate(zip(lids, lmat)):
        sims = rmat @ lv
        cand = [
            (-s, rid) for s, rid in zip(sims, rids)
            if include_self or rid != lid
        ]
        cand.sort()
        for rank, (negs, rid) in enumerate(cand[:k], start=1):
            out.append((int(lid), int(rid), round(-negs, 9), rank))
    return out


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 60),
    d=st.integers(1, 6),
    k=st.integers(1, 12),
    iters=st.integers(1, 6),
    seed=st.integers(0, 10_000),
    dup_heavy=st.booleans(),
)
def test_lloyd_kmeans_invariants(n, d, k, iters, seed, dup_heavy):
    """The driver-local coarse-quantizer trainer: returns min(k, n)
    finite centers, is seed-deterministic, and survives duplicate-heavy
    data (where empty clusters force the distinct-reseed path)."""
    from job_post_similarity_spark.operators.ann import _lloyd_kmeans

    rng = np.random.default_rng(seed)
    mat = rng.integers(-2, 3, size=(n, d)).astype(np.float64)
    if dup_heavy:
        mat[:] = mat[0]  # all points identical: k-1 clusters go empty
    c1 = _lloyd_kmeans(mat, k, iters, seed)
    c2 = _lloyd_kmeans(mat, k, iters, seed)
    assert c1.shape == (min(k, n), d)
    assert np.isfinite(c1).all()
    assert np.array_equal(c1, c2)


def test_lloyd_kmeans_empty_raises():
    import pytest

    from job_post_similarity_spark.operators.ann import _lloyd_kmeans

    with pytest.raises(ValueError, match="empty sample"):
        _lloyd_kmeans(np.empty((0,)), 4, 5, 1)


@settings(max_examples=25, deadline=None)
@given(
    n_left=st.integers(1, 12),
    n_right=st.integers(1, 40),
    d=st.integers(1, 8),
    k=st.integers(1, 6),
    block=st.integers(1, 17),
    include_self=st.booleans(),
    seed=st.integers(0, 10_000),
)
def test_blocked_topk_matches_bruteforce(
    n_left, n_right, d, k, block, include_self, seed
):
    """The per-block argpartition + pooled merge + double-stable-sort
    selection must equal the brute-force oracle for every block size,
    including ties (duplicated vectors)."""
    import job_post_similarity_spark.operators.knn as knn_mod

    rng = np.random.default_rng(seed)
    rmat = rng.integers(-2, 3, size=(n_right, d)).astype(np.float64)
    # duplicate some right rows to force similarity ties
    if n_right >= 4:
        rmat[1] = rmat[0]
        rmat[3] = rmat[2]
    rids = np.arange(n_right)
    lids = np.arange(min(n_left, n_right))  # overlap ids to hit self-mask
    lmat = rmat[: len(lids)].copy()

    expected = brute_topk(lids, lmat, rids, rmat, k, include_self)

    # run the same selection the mapInPandas op performs
    keep = k + 64
    pool_s, pool_i = [], []
    for lo in range(0, n_right, block):
        blk = rmat[lo : lo + block]
        bids = rids[lo : lo + block]
        sims = lmat @ blk.T
        if not include_self:
            sims[lids[:, None] == bids[None, :]] = -np.inf
        if sims.shape[1] > keep:
            part = np.argpartition(-sims, keep - 1, axis=1)[:, :keep]
            pool_s.append(np.take_along_axis(sims, part, axis=1))
            pool_i.append(bids[part])
        else:
            pool_s.append(sims)
            pool_i.append(np.tile(bids, (len(lids), 1)))
    cand_s = np.concatenate(pool_s, axis=1)
    cand_i = np.concatenate(pool_i, axis=1)
    if cand_s.shape[1] > keep:
        part = np.argpartition(-cand_s, keep - 1, axis=1)[:, :keep]
        cand_s = np.take_along_axis(cand_s, part, axis=1)
        cand_i = np.take_along_axis(cand_i, part, axis=1)
    ido = np.argsort(cand_i, axis=1, kind="stable")
    cs = np.take_along_axis(cand_s, ido, axis=1)
    ci = np.take_along_axis(cand_i, ido, axis=1)
    so = np.argsort(-cs, axis=1, kind="stable")[:, :k]
    top_s = np.take_along_axis(cs, so, axis=1)
    top_i = np.take_along_axis(ci, so, axis=1)
    got = []
    for i in range(len(lids)):
        rank = 0
        for j in range(top_s.shape[1]):
            if top_s[i, j] == -np.inf:
                continue
            rank += 1
            got.append((int(lids[i]), int(top_i[i, j]), round(float(top_s[i, j]), 9), rank))
    assert got == expected


@settings(max_examples=50, deadline=None)
@given(st.lists(st.floats(-2, 2, allow_nan=False), min_size=1, max_size=16))
def test_l2_cosine_bridge_identity(vec):
    """1 - ||a-b||²/2 == a·b for unit vectors (V3's premise)."""
    a = np.asarray(vec)
    if np.linalg.norm(a) < 1e-9:
        return
    a = a / np.linalg.norm(a)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(len(a))
    b = b / np.linalg.norm(b)
    sq = float(((a - b) ** 2).sum())
    assert abs((1 - sq / 2) - float(a @ b)) < 1e-9


@settings(max_examples=100, deadline=None)
@given(
    st.integers(0, 2**31 - 2),
    st.integers(0, 2**31 - 2),
    st.integers(1, 31),
)
def test_minhash_universal_hash_range(x, i, seed):
    """Universal-hash lane arithmetic stays in [0, p) without overflow
    for any shingle code (the int64 bound the aggregate relies on)."""
    p = 2**31 - 1
    a = (seed * 1_000_003 + i * 7_919) % p or 1
    b = (seed * 7_907 + i * 104_729) % p
    v = (x % p * a + b) % p
    assert 0 <= v < p
    assert x % p * a + b <= 2**63 - 1  # no int64 overflow


@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",),  # no lone surrogates
                min_codepoint=1,
            ),
            min_size=1,
            max_size=300,
        ),
        max_size=50,
    )
)
@settings(max_examples=200, deadline=None)
def test_poly_hash_batch_equals_scalar(tokens):
    """The vectorized batch hash (UTF-32 matrix + powers dot product,
    incl. the >256-char scalar fallback) must equal the per-char
    rolling hash for ANY unicode token list — the invariant that made
    the round-3 embedder rewrite safe without re-deriving gates."""
    from job_post_similarity_spark.functions.embed import (
        _poly_hash_batch,
        _poly_hash_scalar,
    )

    # tokens must be whitespace-free to be real tokenizer output
    tokens = ["".join(t.split()) for t in tokens]
    tokens = [t for t in tokens if t]
    assert np.array_equal(_poly_hash_scalar(tokens), _poly_hash_batch(tokens))


@settings(max_examples=8, deadline=None)
@given(
    a=st.lists(st.floats(-50, 50, allow_nan=False), min_size=1,
               max_size=40),
    b=st.lists(st.floats(-50, 50, allow_nan=False), min_size=1,
               max_size=40),
)
def test_ks_statistic_symmetry_and_bounds(spark, a, b):
    """KS is symmetric in its two samples, bounded in [0, 1e6] ppm,
    and zero on identical samples."""
    from job_post_similarity_spark.operators.profiling import (
        ks_statistic,
    )

    mk = lambda v: spark.createDataFrame(  # noqa: E731
        [(float(x),) for x in v], "x double"
    )
    d_ab = ks_statistic(mk(a), mk(b), "x").collect()[0]["ks_ppm"]
    d_ba = ks_statistic(mk(b), mk(a), "x").collect()[0]["ks_ppm"]
    assert d_ab == d_ba
    assert 0 <= d_ab <= 1_000_000
    assert ks_statistic(mk(a), mk(a), "x").collect()[0]["ks_ppm"] == 0


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab \t\N{NO-BREAK SPACE}x"),
            max_size=30,
        ),
        min_size=1,
        max_size=8,
    ),
    budget=st.integers(1, 6),
)
def test_truncate_tokens_prefix_property(spark, texts, budget):
    """Kept text is always the first-N prefix of the normalized
    token stream and n_tokens_kept == min(n_tokens, budget)."""
    import re

    from job_post_similarity_spark.operators.preprocess import (
        truncate_tokens,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           truncate_tokens(df, max_tokens=budget).collect()}
    for i, t in enumerate(texts):
        # ASCII-whitespace reference (the Java/RE2 \s contract: NBSP
        # stays INSIDE tokens — the repo-wide tokenizer policy)
        stripped = t.strip(" \t\n\r\f\v").lower()
        toks = [x for x in re.split(r"\s+", stripped, flags=re.ASCII)
                if x]
        r = out[i]
        assert r["n_tokens_kept"] == min(len(toks), budget)
        assert r["text_trunc"] == " ".join(toks[:budget])


@settings(max_examples=8, deadline=None)
@given(
    counts=st.lists(st.integers(1, 500), min_size=1, max_size=5),
    alpha=st.sampled_from([0.3, 0.5, 0.7, 1.0]),
)
def test_temperature_mixture_invariants(spark, counts, alpha):
    """Weights sum to ~PPM (floor-div slack only), every source gets
    a positive weight, rates never exceed PPM, and flattening is
    monotone: smaller sources always gain share vs natural."""
    from job_post_similarity_spark.operators.sampling import (
        temperature_mixture_weights,
    )

    rows = [
        (i * 10_000 + j, f"s{i}")
        for i, n in enumerate(counts)
        for j in range(n)
    ]
    df = spark.createDataFrame(rows, "rid long, src string")
    out = {r["source"]: r for r in
           temperature_mixture_weights(df, "src", alpha=alpha).collect()}
    total = sum(r["weight_ppm"] for r in out.values())
    assert 1_000_000 - len(counts) <= total <= 1_000_000
    n_all = sum(counts)
    for i, n in enumerate(counts):
        r = out[f"s{i}"]
        assert r["n_rows"] == n and r["weight_ppm"] > 0
        assert 0 < r["rate_ppm"] <= 1_000_000
        if alpha < 1.0 and n * len(counts) < n_all:
            # flattening moves shares toward uniform: sources BELOW
            # 1/k natural share can only gain (floor-div slack)
            assert r["weight_ppm"] * n_all >= n * (1_000_000 - len(counts))
