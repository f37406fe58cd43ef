"""Round-4 corpus-scale operators: bigram-LM perplexity, exact heavy
hitters, Bloom-filter decontamination, bucketed co-located joins,
stratified sampling."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- perplexity
def test_bigram_perplexity_matches_numpy_reference(spark):
    from job_post_similarity_spark.operators.text_analysis import (
        bigram_perplexity,
    )

    docs = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the log"),
        (2, "a completely different sentence here"),
        (3, "the cat sat"),
        (4, "single"),  # < 2 tokens: dropped
        (5, "  the   cat  sat  "),  # whitespace noise == doc 3
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["ppl"])
        for r in bigram_perplexity(df).collect()
    }
    assert 4 not in got  # no bigram evidence
    assert set(got) == {0, 1, 2, 3, 5}

    # independent reference implementation
    toks = {i: t.lower().split() for i, t in docs if len(t.split()) >= 2}
    bigs = {i: list(zip(t, t[1:])) for i, t in toks.items()}
    allb = [b for bs in bigs.values() for b in bs]
    c1: dict = {}
    c12: dict = {}
    for w1, w2 in allb:
        c1[w1] = c1.get(w1, 0) + 1
        c12[(w1, w2)] = c12.get((w1, w2), 0) + 1
    V = len({w2 for _, w2 in allb})
    k = 0.5
    for i, bs in bigs.items():
        lp6 = [
            int(np.round(math.log((c12[b] + k) / (c1[b[0]] + k * V)) * 1e6))
            for b in bs
        ]
        ppl = round(math.exp(-sum(lp6) / (len(bs) * 1e6)), 4)
        assert got[i] == (len(bs), pytest.approx(ppl)), i
    # identical token streams => identical perplexity
    assert got[3] == got[5]


def test_bigram_perplexity_flags_atypical_docs(documents):
    from job_post_similarity_spark.operators.text_analysis import (
        bigram_perplexity,
    )

    out = bigram_perplexity(documents).collect()
    assert len(out) > 0
    assert all(r["ppl"] > 0 for r in out)


# ------------------------------------------------------------- heavy hitters
def test_heavy_hitters_exact_vs_groupby(spark):
    from job_post_similarity_spark.operators.profiling import heavy_hitters

    rng = np.random.default_rng(5)
    # zipf-ish: a few heavy values in a sea of uniques
    vals = (
        ["hot"] * 500
        + ["warm"] * 200
        + ["tepid"] * 80
        + [f"cold{i}" for i in rng.integers(0, 5000, size=4000)]
    )
    rng.shuffle(vals)
    df = spark.createDataFrame(
        pd.DataFrame({"v": vals})
    ).repartition(7)  # multiple partitions: the MG merge must hold
    min_share = 0.01
    # small capacity to force MG evictions (still > 1/min_share margin)
    got = {
        (r["v"], r["cnt"])
        for r in heavy_hitters(df, "v", min_share, capacity=400).collect()
    }
    n = len(vals)
    thresh = math.ceil(min_share * n)
    exact = {
        (r["v"], r["cnt"])
        for r in df.groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= thresh)
        .collect()
    }
    assert got == exact
    assert ("hot", 500) in got


def test_heavy_hitters_excludes_nulls(spark):
    from job_post_similarity_spark.operators.profiling import heavy_hitters

    df = spark.createDataFrame(
        [("a",), ("a",), (None,), (None,), (None,), ("b",)], "v string"
    )
    got = {(r["v"], r["cnt"]) for r in heavy_hitters(df, "v", 0.3).collect()}
    # 3 non-null rows; threshold ceil(0.9)=1 -> both a and b qualify
    assert got == {("a", 2), ("b", 1)}


def test_frequent_tokens_on_documents(documents):
    from job_post_similarity_spark.operators.text_analysis import (
        frequent_tokens,
    )

    out = frequent_tokens(documents, min_share=0.01).collect()
    assert len(out) > 0
    # descending by count, ties by token
    cnts = [r["cnt"] for r in out]
    assert cnts == sorted(cnts, reverse=True)


# ------------------------------------------------------------------- bloom
def test_bloom_decontaminate_equals_anti_join(spark):
    from job_post_similarity_spark.operators.curation import (
        bloom_decontaminate,
    )

    corpus = spark.range(0, 3000).withColumn(
        "payload", F.col("id") * 2
    ).withColumnRenamed("id", "doc_id")
    contam = spark.createDataFrame(
        [(int(i),) for i in range(0, 3000, 7)], "doc_id long"
    )
    # tiny filter: forces false positives, which the verify join must kill
    got = bloom_decontaminate(
        corpus, contam, "doc_id", num_bits=1 << 10, num_hashes=3
    )
    expect = corpus.join(contam, "doc_id", "left_anti")
    g = {tuple(r) for r in got.collect()}
    e = {tuple(r) for r in expect.collect()}
    assert g == e
    assert len(g) == 3000 - len(range(0, 3000, 7))


def test_bloom_probe_prunes_most_clean_rows(spark):
    """With a well-sized filter the candidate branch (rows that pay
    the exact join) must be close to the true contaminated count."""
    from job_post_similarity_spark.operators.curation import (
        bloom_build_bits,
    )

    corpus_n, contam_n = 5000, 200
    contam = spark.range(0, contam_n).withColumnRenamed("id", "doc_id")
    bits = bloom_build_bits(contam, "doc_id", num_bits=1 << 14, num_hashes=5)
    # probe all corpus ids driver-side with the same JVM hash
    probe = spark.range(0, corpus_n).select(
        F.array(
            *[
                F.pmod(F.xxhash64(F.col("id"), F.lit(i)), F.lit(1 << 14))
                for i in range(5)
            ]
        ).alias("pos")
    ).collect()
    hits = 0
    for r in probe:
        if all(
            (int(bits[p // 64]) >> (p % 64)) & 1 for p in r["pos"]
        ):
            hits += 1
    # 200 true + a small fp sliver (fpp ~ (1-e^{-5*200/16384})^5 ~ 1e-6)
    assert contam_n <= hits <= contam_n + 25


# ----------------------------------------------------------- bucketed join
def test_bucketed_join_is_shuffle_free_and_correct(spark, tmp_path):
    from job_post_similarity_spark.sources.io import (
        bucketed_join,
        load_table,
        write_bucketed,
    )

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    cust = load_table(spark, "/root/testdata/sf0.001", "customer")
    write_bucketed(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "t_orders_b",
        "o_custkey",
        num_buckets=4,
        path=str(tmp_path / "orders_b"),
    )
    write_bucketed(
        cust.select(F.col("c_custkey").alias("o_custkey"), "c_name"),
        "t_cust_b",
        "o_custkey",
        num_buckets=4,
        path=str(tmp_path / "cust_b"),
    )
    joined = bucketed_join(spark, "t_orders_b", "t_cust_b", "o_custkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    expect = (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .join(
            cust.select(F.col("c_custkey").alias("o_custkey"), "c_name"),
            "o_custkey",
        )
        .count()
    )
    assert joined.count() == expect
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_cust_b")


# ------------------------------------------------------- stratified sample
def test_stratified_sample_counts_and_determinism(spark):
    from job_post_similarity_spark.operators.sampling import (
        stratified_sample,
    )

    rows = [(i, ["a", "b", "c"][i % 3] if i < 900 else "rare") for i in range(903)]
    df = spark.createDataFrame(rows, "id long, grp string")
    got = stratified_sample(df, "grp", 5, "id")
    per = {
        r["grp"]: r["cnt"]
        for r in got.groupBy("grp").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert per == {"a": 5, "b": 5, "c": 5, "rare": 3}
    # deterministic under different partitioning
    a = {tuple(r) for r in got.collect()}
    b = {
        tuple(r)
        for r in stratified_sample(df.repartition(11), "grp", 5, "id").collect()
    }
    assert a == b


# ---------------------------------------------------- resample / ffill
def test_resample_ffill_fills_gaps_and_carries_forward(spark):
    from job_post_similarity_spark.operators.windows import resample_ffill

    rows = [
        (0, "2024-01-01 00:10:00", "a", 1.0),
        (1, "2024-01-01 00:50:00", "a", 3.0),   # same bucket, max wins
        (2, "2024-01-01 03:10:00", "a", 7.0),   # 2-bucket gap before
        (3, "2024-01-01 01:05:00", "b", 5.0),
        (4, None, "a", 9.9),                     # null ts excluded
        (5, "2024-01-01 02:00:00", None, 1.1),   # null group excluded
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        (r["grp"], r["bucket"]): (r["cnt"], r["vmax"], r["filled"])
        for r in resample_ffill(df, "ts", "event_type", "value").collect()
    }
    h0 = 1704067200  # 2024-01-01 00:00 UTC
    # spine spans global min..max bucket for every group
    assert {g for g, _ in out} == {"a", "b"}
    assert len(out) == 8  # 2 groups x 4 hourly buckets
    assert out[("a", h0)] == (2, 3.0, 3.0)
    assert out[("a", h0 + 3600)] == (0, None, 3.0)   # gap: carried
    assert out[("a", h0 + 7200)] == (0, None, 3.0)
    assert out[("a", h0 + 3 * 3600)] == (1, 7.0, 7.0)
    assert out[("b", h0)] == (0, None, None)         # before first obs
    assert out[("b", h0 + 3600)] == (1, 5.0, 5.0)
    assert out[("b", h0 + 3 * 3600)] == (0, None, 5.0)


# ------------------------------------------------------------ z-score
def test_group_zscore_matches_numpy(spark):
    from job_post_similarity_spark.operators.windows import group_zscore

    rng = np.random.default_rng(2)
    vals = rng.normal(10, 3, size=200).round(2)
    rows = [
        (i, "g1" if i % 2 == 0 else "g2", float(v))
        for i, v in enumerate(vals)
    ] + [(200, "solo", 5.0), (201, "g1", None)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    got = {r["id"]: r["z"] for r in group_zscore(df, "grp", "v").collect()}
    assert got[200] is None  # n=1: no scale
    assert got[201] is None  # null value
    for grp in ("g1", "g2"):
        sel = [v for i, v in enumerate(vals) if (i % 2 == 0) == (grp == "g1")]
        mu, sd = np.mean(sel), np.std(sel, ddof=1)
        for i, v in enumerate(vals):
            if (i % 2 == 0) == (grp == "g1"):
                assert got[i] == pytest.approx(
                    round((v - mu) / sd, 4), abs=1e-4
                )


# --------------------------------------------------------------- json
def test_parse_json_fields_types_and_malformed(spark):
    from job_post_similarity_spark.operators.preprocess import (
        parse_json_fields,
    )

    df = spark.createDataFrame(
        [
            (0, '{"k": 1, "name": "x"}'),
            (1, '{"k": "not-an-int", "name": "y"}'),
            (2, "not json at all"),
            (3, None),
            (4, '{"name": "only"}'),
        ],
        "id long, props string",
    )
    out = {
        r["id"]: (r["k"], r["name"])
        for r in parse_json_fields(df, "props", "k int, name string").collect()
    }
    assert out[0] == (1, "x")
    assert out[1] == (None, "y")  # type mismatch -> typed null
    assert out[2] == (None, None)  # malformed -> nulls (PERMISSIVE)
    assert out[3] == (None, None)
    assert out[4] == (None, "only")


# --------------------------------------------------------------- melt
def test_melt_round_trip(spark):
    from job_post_similarity_spark.operators.preprocess import melt

    df = spark.createDataFrame(
        [(1, 2.0, 3.0), (2, 4.0, None)], "id long, a double, b double"
    )
    out = {(r["id"], r["key"]): r["val"] for r in melt(df, ["id"], ["a", "b"]).collect()}
    assert out == {
        (1, "a"): 2.0, (1, "b"): 3.0, (2, "a"): 4.0, (2, "b"): None,
    }


# ----------------------------------------------------------- fuzzy join
def test_fuzzy_join_dist1_equals_brute_force(spark):
    """Deletion-neighborhood blocking must be 100%-recall for
    edit distance <= 1: output equals the quadratic cross join."""
    from job_post_similarity_spark.operators.dedup import fuzzy_join_dist1

    names = [
        "kitten", "sitten", "kitte", "kittens", "mitten",  # dist-1 cluster
        "apple", "aple", "appl", "apples",
        "zebra", "zebra",  # exact dup under two ids -> dist 0
        "", "a",           # empty-string edges
        "xyzzy",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(names)], "id long, s string"
    )
    got = {
        (r["id1"], r["id2"], r["dist"])
        for r in fuzzy_join_dist1(df, "id", "s").collect()
    }
    import itertools

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    expect = {
        (i, j, lev(names[i], names[j]))
        for i, j in itertools.combinations(range(len(names)), 2)
        if lev(names[i], names[j]) <= 1
    }
    assert got == expect
    assert (9, 10, 0) in got  # exact-dup pair surfaced at dist 0
    assert (11, 12, 1) in got  # "" vs "a"


# --------------------------------------------------------------- PMI
def test_pmi_collocations_finds_planted_phrase(spark):
    from job_post_similarity_spark.operators.text_analysis import (
        pmi_collocations,
    )

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(50)]
    docs = []
    for i in range(60):
        words = list(rng.choice(vocab, size=20))
        # plant a rigid collocation in every doc: "zeta prime"
        words[5:5] = ["zeta", "prime"]
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pmi_collocations(df, min_count=5, top_n=10).collect()
    assert out[0]["w1"] == "zeta" and out[0]["w2"] == "prime"
    assert out[0]["rank"] == 1 and out[0]["pmi"] > 0
    ranks = [r["rank"] for r in out]
    assert ranks == list(range(1, len(out) + 1))


# ------------------------------------------------------ streaming CDC
def test_stream_keep_latest_folds_out_of_order_batches(spark, tmp_path):
    """An older row arriving in a LATER micro-batch must not displace
    the newer state row; a newer one must. The folded snapshot equals
    batch keep_latest over the union, regardless of batch split."""
    import os

    import pandas as pd

    from job_post_similarity_spark.streaming import stream_ops

    src = str(tmp_path / "cdc_src")
    os.makedirs(src)
    s = 10**9  # ns per second
    batches = [
        # (event_id, ts_ns, user, value)
        [(0, 100 * s, 1, 1.0), (1, 200 * s, 2, 2.0)],
        [(2, 50 * s, 1, 9.9), (3, 300 * s, 2, 3.5)],  # user1: OLDER row
        [(4, 400 * s, 1, 7.0)],
    ]
    for i, rows in enumerate(batches):
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": [r[1] for r in rows],
                "user_id": [r[2] for r in rows],
                "event_type": ["t"] * len(rows),
                "value": [r[3] for r in rows],
                "props": ["p"] * len(rows),
            }
        ).to_parquet(os.path.join(src, f"e_{i}.parquet"))

    raw = (
        spark.readStream.schema(stream_ops.EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("path", src)
        .option("maxFilesPerTrigger", "1")
        .load()
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    changelog = stream_ops._keep_latest_stateful(raw)
    q = (
        changelog.writeStream.format("memory")
        .queryName("t_cdc")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM t_cdc").collect()
    # user 1: emitted at batch 0 (eid 0) and batch 2 (eid 4) — batch 1's
    # older row must NOT have been emitted. user 2: batches 0 and 1.
    emitted = {(r["user_id"], r["event_id"]) for r in rows}
    assert emitted == {(1, 0), (1, 4), (2, 1), (2, 3)}
    # folded snapshot = global latest per key
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    snap = {
        (r["user_id"], r["event_id"], r["value"])
        for r in spark.sql("SELECT * FROM t_cdc")
        .withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .collect()
    }
    assert snap == {(1, 4, 7.0), (2, 3, 3.5)}


def test_stream_static_enrich_matches_batch_join(spark, sf_dir):
    from job_post_similarity_spark.sources.io import load_table
    from job_post_similarity_spark.streaming import stream_static_enrich

    static = spark.createDataFrame(
        [("click", 1), ("view", 2), ("error", 3)], "event_type string, code int"
    )
    got = {
        (r["event_type"], r["cnt"])
        for r in stream_static_enrich(
            spark, sf_dir, static, name="t_enrich"
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    expect = {
        (r["event_type"], r["cnt"])
        for r in ev.join(F.broadcast(static), "event_type")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == expect and len(got) == 3


# ------------------------------------------------- knn f64-cache tiers
def test_knn_join_uncached_upcast_path_is_bit_identical(spark, monkeypatch):
    """Past the f64-cache ceiling, blocks stay f32 and matmul promotes
    transiently — the output must be bit-identical to the cached
    path (f32->f64 is exact, accumulation is f64 either way)."""
    import numpy as np
    import pandas as pd

    from job_post_similarity_spark.operators import knn

    rng = np.random.default_rng(13)
    m = rng.standard_normal((300, 32)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    pdf = pd.DataFrame({"vec_id": np.arange(300), "embedding": list(m)})
    df = spark.createDataFrame(pdf)
    cached = knn.knn_join(df, "vec_id", "embedding", k=3).collect()
    monkeypatch.setattr(knn, "_F64_CACHE_BYTES", 0)
    streamed = knn.knn_join(df, "vec_id", "embedding", k=3).collect()
    key = lambda rows: sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["similarity"])
        for r in rows
    )
    assert key(cached) == key(streamed) and len(cached) == 900


def test_ivf_topk_prebuilt_multiprobe_assignment_dedups(spark):
    """A multi-probe prebuilt assignment places corpus vectors in
    several buckets; serving must not list a neighbor twice."""
    import numpy as np
    import pandas as pd

    from job_post_similarity_spark.operators import ann

    rng = np.random.default_rng(21)
    m = rng.standard_normal((120, 16)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    pdf = pd.DataFrame({"vec_id": np.arange(120), "embedding": list(m)})
    corpus = spark.createDataFrame(pdf)
    assigned, centers = ann.ivf_assign(
        corpus, "embedding", n_centroids=4, n_probe=3, id_col="vec_id"
    )
    queries = corpus.filter(F.col("vec_id") < 5)
    out = ann.ivf_topk_search(
        queries, corpus, k=4, n_probe=3, prebuilt=(assigned, centers)
    ).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    for q, ns in per_q.items():
        assert len(ns) == len(set(ns)), (q, ns)  # no duplicate neighbors
        assert len(ns) == 4


# --------------------------------------------------------------- jsonl
def test_jsonl_round_trip_and_schema_pushdown(spark, tmp_path, documents):
    from job_post_similarity_spark.sources.io import read_jsonl, write_jsonl

    path = str(tmp_path / "docs_jsonl")
    write_jsonl(documents.select("doc_id", "text", "lang"), path)
    back = read_jsonl(
        spark, path, schema="doc_id long, text string, lang string"
    )
    a = {tuple(r) for r in back.collect()}
    b = {
        tuple(r) for r in documents.select("doc_id", "text", "lang").collect()
    }
    assert a == b
    # malformed line -> PERMISSIVE nulls
    bad = tmp_path / "bad.jsonl"
    bad.write_text('{"doc_id": 1, "text": "ok"}\nnot json\n')
    rows = read_jsonl(
        spark, str(bad), schema="doc_id long, text string"
    ).collect()
    assert len(rows) == 2
    assert {r["doc_id"] for r in rows} == {1, None}


def test_pagerank_cycle_is_fixed_point(spark):
    """On a cycle every node keeps exactly RANK_UNIT: in_sum == pr of
    the single predecessor, so base + d*pr//unit == pr."""
    from job_post_similarity_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    out = {r["node"]: r["pr"] for r in pagerank(edges, iterations=4).collect()}
    assert out == {"a": 1_000_000, "b": 1_000_000, "c": 1_000_000}


def test_pagerank_star_hand_computed(spark):
    """a->{b,c} with dangling b, c: iter1 b=c=575000, a=150000;
    iter2 b=c=150000+850000*(150000//2)//1e6=213750."""
    from job_post_similarity_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "src string, dst string"
    )
    one = {r["node"]: r["pr"] for r in pagerank(edges, iterations=1).collect()}
    assert one == {"a": 150_000, "b": 575_000, "c": 575_000}
    two = {r["node"]: r["pr"] for r in pagerank(edges, iterations=2).collect()}
    assert two == {"a": 150_000, "b": 213_750, "c": 213_750}


def test_bipartite_edges_symmetric_and_prefixed(spark):
    from pyspark.sql import functions as F

    from job_post_similarity_spark.operators.graph import bipartite_edges

    df = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 10)], "l long, r long"
    )
    e = bipartite_edges(df, "l", "r", ("L", "R"))
    rows = sorted(tuple(x) for x in e.collect())
    assert rows == [
        ("L1", "R10"),
        ("L2", "R10"),
        ("R10", "L1"),
        ("R10", "L2"),
    ]
    # symmetric edges => no dangling nodes => rank mass is conserved
    from job_post_similarity_spark.operators.graph import pagerank

    pr = pagerank(e, iterations=3)
    total = pr.agg(F.sum("pr")).first()[0]
    # floor-div loses at most (outdeg-1)+999999/1e6 ppm per node/iter;
    # with 3 nodes the conserved mass stays within a few ppm of 3e6
    assert abs(total - 3_000_000) < 10


def test_orc_roundtrip_preserves_types(spark, tmp_path):
    """ORC sink/scan roundtrip including nested array<double> and
    timestamp columns (Spark's native vectorized ORC path)."""
    import datetime as dt

    from job_post_similarity_spark.sources.io import read_orc, write_orc

    df = spark.createDataFrame(
        [
            (1, "a", [0.1, 0.2], dt.datetime(2024, 1, 1, 12, 0)),
            (2, None, [], dt.datetime(2024, 1, 2)),
        ],
        "id long, s string, v array<double>, ts timestamp",
    )
    path = str(tmp_path / "orc_out")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert back.schema == df.schema
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )


def test_morton_key_hand_values(spark):
    """morton_key interleaves bits: (a=0b11, b=0b00)->0b0101=5,
    (a=0, b=0b11)->0b1010=10, (3,3)->15; masks to `bits` low bits."""
    from pyspark.sql import functions as F

    from job_post_similarity_spark.sources.io import morton_key

    df = spark.createDataFrame(
        [(3, 0), (0, 3), (3, 3), (2, 1), (4 + 16, 0)],
        "a long, b long",
    )
    out = [
        r["z"]
        for r in df.select(morton_key("a", "b", bits=2).alias("z")).collect()
    ]
    # bits=2 masks inputs to 2 bits: 4+16 -> 0
    assert out == [5, 10, 15, 6, 0]


def test_write_zordered_improves_two_dim_file_locality(spark, tmp_path):
    """Each z-ordered file must cover a small rectangle in BOTH
    dimensions: summed per-file spans of x AND y are each well below
    the spans of a single-column-sorted layout's unsorted dimension."""
    from pyspark.sql import functions as F

    from job_post_similarity_spark.sources.io import write_zordered

    n = 64
    rows = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x long, y long").repartition(8)

    zpath = str(tmp_path / "zord")
    write_zordered(df, zpath, ("x", "y"), bits=6, num_files=16)

    # baseline: sort by x only -> y stats are useless per file
    xpath = str(tmp_path / "xsort")
    (
        df.repartitionByRange(16, F.col("x"))
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )

    def spans(path, col):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name())
            .agg((F.max(col) - F.min(col)).alias("span"))
        )
        return [r["span"] for r in per_file.collect()]

    z_y_spans = spans(zpath, "y")
    x_y_spans = spans(xpath, "y")
    # x-sorted files each see (almost) the full y range; z-ordered
    # files see a bounded rectangle
    assert max(x_y_spans) >= n - 2
    assert max(z_y_spans) <= n / 2
    assert max(spans(zpath, "x")) <= n / 2


def test_pagerank_every_node_receives_fast_path_equal(spark):
    """On a symmetric graph the no-nodes-join fast path returns
    exactly the generic result."""
    from job_post_similarity_spark.operators.graph import (
        bipartite_edges,
        pagerank,
    )

    df = spark.createDataFrame(
        [(i % 7, i % 3) for i in range(30)], "l long, r long"
    )
    e = bipartite_edges(df, "l", "r", ("L", "R"))
    slow = sorted(tuple(r) for r in pagerank(e, iterations=2).collect())
    fast = sorted(
        tuple(r)
        for r in pagerank(e, iterations=2, every_node_receives=True).collect()
    )
    assert slow == fast


def test_stream_click_attribution_window_bounds(spark, tmp_path):
    """Stream-stream join: clicks exactly 30 min before and exactly at
    the purchase both attach; later clicks and other users don't."""
    import os

    import pandas as pd

    from job_post_similarity_spark.streaming import stream_click_attribution

    src = str(tmp_path / "ssj_src")
    os.makedirs(src)
    m = 60 * 10**9  # ns per minute
    base = 10_000
    rows = [
        # (event_id, ts_min, user_id, event_type)
        (0, base + 20, 1, "purchase"),
        (1, base + 0, 1, "click"),    # 20 min before -> attributed
        (2, base + 100, 1, "click"),  # after purchase -> no
        (3, base + 19, 2, "click"),   # other user -> no
        (4, base - 10, 1, "click"),   # exactly 30 min before -> yes
        (5, base + 20, 1, "click"),   # same instant -> yes
    ]
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [r[1] * m for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [0.0] * len(rows),
            "props": ["p"] * len(rows),
        }
    ).to_parquet(os.path.join(src, "events.parquet"))

    out = stream_click_attribution(spark, src, name="t_ssj")
    pairs = {(r["purchase_id"], r["click_id"]) for r in out.collect()}
    assert pairs == {(0, 1), (0, 4), (0, 5)}


def test_inverted_index_caps_and_sorts_postings(spark):
    from job_post_similarity_spark.operators.text_analysis import (
        inverted_index,
    )

    df = spark.createDataFrame(
        [(3, "a b"), (1, "a a b"), (2, "a x"), (4, "b")],
        "doc_id long, text string",
    )
    out = {
        r["token"]: (r["df"], r["postings"])
        for r in inverted_index(df, min_df=2, max_postings=2).collect()
    }
    # within-doc repeats count once; postings sorted, capped at 2
    assert out == {"a": (3, [1, 2]), "b": (3, [1, 3])}


def test_bm25_matches_numpy_reference(spark):
    import math

    from job_post_similarity_spark.operators.text_analysis import bm25_rank

    docs = {
        1: "spark join spark table",
        2: "join window",
        3: "table scan row",
        4: "spark spark spark window join",
    }
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    query, k1, b = ["spark", "join", "window"], 1.2, 0.75
    toks = {d: t.split() for d, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfreq = {
        q: sum(1 for t in toks.values() if q in t) for q in query
    }
    expect = {}
    for d, t in toks.items():
        s = 0
        for q in query:
            tf = t.count(q)
            if tf == 0:
                continue
            idf = math.log((n - dfreq[q] + 0.5) / (dfreq[q] + 0.5) + 1.0)
            s += round(
                (idf * (tf * (k1 + 1.0)))
                / (tf + k1 * (1.0 - b + b * len(t) / avgdl))
                * 1e6
            )
        if s:
            expect[d] = s / 1e6
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_rank(df, query, k1=k1, b=b).collect()
    }
    assert got == expect


def test_skew_profile_gini_extremes(spark):
    from job_post_similarity_spark.operators.skew import skew_profile

    # uniform: 4 keys x 3 rows -> gini 0
    uni = spark.createDataFrame(
        [(k,) for k in range(4) for _ in range(3)], "k long"
    )
    r = skew_profile(uni, "k", top_n=2).first()
    assert (r["n_keys"], r["total_rows"], r["max_cnt"], r["top2_cnt"]) == (
        4, 12, 3, 6,
    )
    assert r["gini6"] == 0
    # one hot key dominating: gini near (n-1)/n-ish, strictly positive
    hot = spark.createDataFrame(
        [(0,)] * 97 + [(1,), (2,), (3,)], "k long"
    )
    r2 = skew_profile(hot, "k", top_n=1).first()
    assert r2["max_cnt"] == 97 and r2["top1_cnt"] == 97
    assert r2["gini6"] > 700_000


def test_hash_split_partition_exhaustive_and_stable(spark):
    """Every row lands in exactly one split; membership depends only
    on the key (stable under append/repartition); weights sum check."""
    import pytest

    from pyspark.sql import functions as F

    from job_post_similarity_spark.operators.sampling import hash_split

    df = spark.createDataFrame([(i,) for i in range(5000)], "k long")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = hash_split(df, "k", w)
    counts = {r["split"]: r["cnt"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert sum(counts.values()) == 5000
    assert counts["train"] > 3500 and counts["val"] > 200 and counts["test"] > 200
    # stability: a subset keeps identical assignments
    sub = hash_split(df.filter("k < 100").repartition(7), "k", w)
    full = {r["k"]: r["split"] for r in out.filter("k < 100").collect()}
    assert {r["k"]: r["split"] for r in sub.collect()} == full
    with pytest.raises(ValueError):
        hash_split(df, "k", {"a": 0.9, "b": 0.2})


def test_winsorize_by_group_clips_to_group_bounds(spark):
    import pytest

    from job_post_similarity_spark.operators.profiling import (
        winsorize_by_group,
    )

    rows = [("g", float(v)) for v in range(1, 101)] + [("h", 5.0), ("h", 6.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = winsorize_by_group(df, "grp", "v", lo=0.10, hi=0.90)
    g = [r["v_w"] for r in out.filter("grp = 'g'").collect()]
    # exact continuous p10 of 1..100 = 10.9, p90 = 90.1 (IEEE)
    assert min(g) == pytest.approx(10.9) and max(g) == pytest.approx(90.1)
    # group h is untouched within its own (tiny) bounds
    h = sorted(r["v_w"] for r in out.filter("grp = 'h'").collect())
    assert h == pytest.approx([5.1, 5.9])


def test_bpe_merge_pairs_counts_weighted_vocab(spark):
    from job_post_similarity_spark.operators.text_analysis import (
        bpe_merge_pairs,
    )

    df = spark.createDataFrame(
        [("low low low lower",), ("LOWEST low x1 a",)], "text string"
    )
    out = {r["pair"]: r["pair_count"] for r in
           bpe_merge_pairs(df, top_n=10, min_count=1).collect()}
    # 'low' ×4, 'lower' ×1, 'lowest' ×1 → 'lo'/'ow' in all 6;
    # 'x1' and bare 'a' filtered (non-alpha / length < 2)
    assert out["lo"] == 6 and out["ow"] == 6
    assert out["we"] == 2          # loWEr + loWEst
    assert out["er"] == 1 and out["st"] == 1
    assert "x1" not in out and "1a" not in out


def test_chi2_token_label_perfect_separator(spark):
    from job_post_similarity_spark.operators.text_analysis import (
        chi2_token_label,
    )

    rows = [(i, "aaa bbb", "en") for i in range(5)] + [
        (i + 5, "ccc bbb", "fr") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = chi2_token_label(df, min_df=5, top_n=10).collect()
    by = {(r["token"], r["label"]): r["chi2"] for r in out}
    # 'aaa' perfectly separates en from fr: chi2 = N = 10
    assert by[("aaa", "en")] == 10.0
    # (token, label) cells with a = 0 are absent by design — only
    # observed co-occurrences are scored
    assert ("aaa", "fr") not in by
    # 'bbb' is in every doc → degenerate margin, filtered out
    assert not any(t == "bbb" for t, _ in by)
    # rank 1 is deterministic: max chi2, token asc, label asc
    first = [r for r in out if r["rank"] == 1][0]
    assert first["token"] == "aaa" and first["label"] == "en"


def test_mad_outliers_flags_only_extremes(spark):
    from job_post_similarity_spark.operators.profiling import mad_outliers

    vals = [float(v) for v in range(1, 12)]  # median 6, MAD 3
    rows = [("g", v) for v in vals] + [("g", 100.0), ("g", -50.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = mad_outliers(df, "grp", "v", k=3.0)
    flagged = sorted(r["v"] for r in out.filter("is_outlier").collect())
    # |x-6| > 3*MAD; with the two extremes the median shifts to 6.0
    # and MAD to 3.5 → cut at 16.5 from 6
    assert flagged == [-50.0, 100.0]
    assert out.filter("NOT is_outlier").count() == 11


def test_basket_pair_lift_exact_counts(spark):
    from job_post_similarity_spark.operators.association import (
        basket_pair_lift,
    )

    rows = [
        (1, "a"), (1, "b"), (2, "a"), (2, "b"),
        (3, "a"), (3, "c"), (4, "d"), (4, "d"),  # dup collapses
    ]
    df = spark.createDataFrame(rows, "b long, i string")
    out = {(r["item_a"], r["item_b"]): (r["pair_count"], r["lift_ppm"])
           for r in basket_pair_lift(df, "b", "i", min_pair_count=1).collect()}
    # lift(a,b) = 4 baskets * 2 pairs / (3 * 2) = 1.333… → 1333333 ppm
    assert out[("a", "b")] == (2, 1333333)
    # lift(a,c) = 4 * 1 / (3 * 1) → 1333333 ppm
    assert out[("a", "c")] == (1, 1333333)
    assert ("d", "d") not in out  # self-pairs excluded


def test_knn_classify_majority_and_tiebreak(spark):
    from job_post_similarity_spark.operators.knn import knn_classify

    # 1-d embeddings: clean majority for id 0's 3 neighbors
    rows = [
        (0, [1.0], "x"), (1, [0.99], "x"), (2, [0.98], "x"),
        (3, [0.97], "y"), (4, [-1.0], "y"),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    out = {r["vec_id"]: (r["pred_label"], r["votes"])
           for r in knn_classify(df, k=3).collect()}
    assert out[0] == ("x", 2)  # neighbors 1,2 (x) + 3 (y)
    # id 4: neighbors among 0..3 by cosine sign — all dotted -1 → ties
    # broken by neighbor id asc → 1,2,3? k=3 → labels x,x,y → x
    assert out[4][0] == "x"


def test_prefix_jaccard_join_matches_bruteforce(spark):
    import itertools

    from job_post_similarity_spark.operators.dedup import (
        prefix_jaccard_join,
    )

    texts = [
        "red green blue yellow",
        "red green blue purple",
        "red green blue yellow",   # dup of 0
        "cat dog",
        "cat dog bird",
        "entirely different tokens here",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    t_ppm = 600_000
    got = {(r["id1"], r["id2"]): r["jaccard_ppm"]
           for r in prefix_jaccard_join(df, threshold_ppm=t_ppm).collect()}
    # brute force
    sets = [set(t.split()) for t in texts]
    want = {}
    for i, j in itertools.combinations(range(len(texts)), 2):
        inter = len(sets[i] & sets[j])
        union = len(sets[i] | sets[j])
        ppm = (1_000_000 * inter) // union
        if ppm >= t_ppm:
            want[(i, j)] = ppm
    assert got == want and (0, 2) in got and got[(0, 2)] == 1_000_000


def test_triangle_counts_known_graph(spark):
    from job_post_similarity_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4} (4 triangles, each node in 3) + pendant 5
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges.append((4, 5))
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["n_tri"] for r in triangle_counts(df).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_cooccurrence_edges_weight_and_cut(spark):
    from job_post_similarity_spark.operators.graph import (
        cooccurrence_edges,
    )

    rows = [(g, n) for g in range(3) for n in (1, 2)] + [(0, 3)]
    df = spark.createDataFrame(rows, "g long, n long")
    out = [(r["src"], r["dst"], r["weight"])
           for r in cooccurrence_edges(df, "g", "n", top_edges=2).collect()]
    # (1,2) shares 3 groups; (1,3)/(2,3) share 1 → top-2 cut keeps
    # (1,2) then (1,3) by the (weight desc, src, dst) total order
    assert out == [(1, 2, 3), (1, 3, 1)]


def test_label_centroids_exact_means(spark):
    from job_post_similarity_spark.operators.knn import label_centroids

    rows = [
        (0, [1.0, 0.0], "a"), (1, [0.0, 1.0], "a"), (2, [0.5, 0.5], "b"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    out = {(r["label"], r["pos"]): r["centroid"]
           for r in label_centroids(df).collect()}
    assert out == {("a", 0): 0.5, ("a", 1): 0.5,
                   ("b", 0): 0.5, ("b", 1): 0.5}


def test_cohort_retention_counts(spark):
    import datetime as dt

    from job_post_similarity_spark.operators.windows import (
        cohort_retention,
    )

    # mondays: 2024-01-01, -08, -15
    rows = [
        (1, dt.datetime(2024, 1, 2)),   # cohort w0
        (1, dt.datetime(2024, 1, 10)),  # w0 + 1
        (2, dt.datetime(2024, 1, 3)),   # cohort w0 only
        (3, dt.datetime(2024, 1, 9)),   # cohort w1
        (3, dt.datetime(2024, 1, 16)),  # w1 + 1
        (3, dt.datetime(2024, 1, 17)),  # same week, collapses
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(str(r["cohort_week"]), r["week_offset"]): r["active_users"]
           for r in cohort_retention(df, "user_id", "ts").collect()}
    assert out == {
        ("2024-01-01", 0): 2, ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1, ("2024-01-08", 1): 1,
    }


def test_phrase_search_positions_and_counts(spark):
    from job_post_similarity_spark.operators.text_analysis import (
        phrase_search,
    )

    rows = [
        (0, "big table hash join"),           # 1 hit
        (1, "table hash table hash"),         # 2 hits
        (2, "hash table"),                    # reversed — no hit
        (3, "table x hash"),                  # gap — no hit
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["n_hits"]
           for r in phrase_search(df, "table hash").collect()}
    assert out == {0: 1, 1: 2}
    # three-word phrase exercises the chained join
    out3 = {r["doc_id"]: r["n_hits"]
            for r in phrase_search(df, "big table hash").collect()}
    assert out3 == {0: 1}


def test_stream_topk_equals_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from job_post_similarity_spark.sources.io import load_table
    from job_post_similarity_spark.streaming import stream_topk

    got = [(r["user_id"], r["cnt"]) for r in
           stream_topk(spark, sf_dir, k=5, name="st_topk_test").collect()]
    want = [(r["user_id"], r["cnt"]) for r in
            load_table(spark, sf_dir, "events")
            .filter(F.col("user_id").isNotNull())
            .groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("user_id")).limit(5).collect()]
    assert got == want and len(got) == 5


def test_incremental_agg_equals_full_rescan(spark):
    from job_post_similarity_spark.operators.cdc import (
        incremental_agg,
        partial_agg,
    )

    rows = [("a", 1, 10.0), ("a", 2, 5.0), ("b", 3, 2.0),
            ("a", 4, 7.0), ("c", 5, 1.0)]
    df = spark.createDataFrame(rows, "k string, id long, v double")
    keys, meas = ["k"], {
        "n": ("count", "id"), "s": ("sum", "v"),
        "mn": ("min", "v"), "mx": ("max", "v"),
    }
    # fold in two different splits — both must equal the full rescan
    full = {tuple(r) for r in partial_agg(df, keys, meas).collect()}
    for cut in (2, 4):
        base = partial_agg(df.filter(F.col("id") <= cut), keys, meas)
        got = incremental_agg(
            base, df.filter(F.col("id") > cut), keys, meas
        )
        assert {tuple(r) for r in got.collect()} == full, cut
    # a second incremental fold on top of the first
    s1 = partial_agg(df.filter("id <= 2"), keys, meas)
    s2 = incremental_agg(s1, df.filter("id = 3 or id = 4"), keys, meas)
    s3 = incremental_agg(s2, df.filter("id = 5"), keys, meas)
    assert {tuple(r) for r in s3.collect()} == full
    import pytest

    with pytest.raises(ValueError):
        partial_agg(df, keys, {"bad": ("median", "v")})


def test_token_windows_udtf_matches_python(spark):
    from job_post_similarity_spark.functions.udtf_ops import (
        token_windows,
    )

    rows = [
        (0, "a b c d e"),      # size 2 -> 3 windows, last ragged
        (1, "  x  "),          # 1 token
        (2, "   "),            # whitespace only -> no rows
        (3, None),             # null -> no rows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["doc_id"], r["win_idx"], r["win_text"], r["n_tokens"])
           for r in token_windows(spark, df, size=2)
           .orderBy("doc_id", "win_idx").collect()]
    assert got == [
        (0, 0, "a b", 2), (0, 1, "c d", 2), (0, 2, "e", 1),
        (1, 0, "x", 1),
    ]


def test_hard_negatives_label_filter_and_rank(spark):
    from job_post_similarity_spark.operators.knn import hard_negatives

    rows = [
        (0, [1.0, 0.0], "a"),
        (1, [0.99, 0.14], "a"),   # closest overall but same label
        (2, [0.9, 0.43], "b"),    # top negative
        (3, [0.0, 1.0], "b"),
        (4, [-1.0, 0.0], "c"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    out = [(r["query_id"], r["neighbor_id"], r["rank"])
           for r in hard_negatives(df, k=2)
           .orderBy("query_id", "rank").collect()
           if r["query_id"] == 0]
    # same-label neighbor 1 excluded; negatives ranked 2 then 3
    assert out == [(0, 2, 1), (0, 3, 2)]


def test_event_transitions_counts_and_ppm(spark):
    import datetime as dt

    from job_post_similarity_spark.operators.windows import (
        event_transitions,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "a"), (1, t0, 2, "b"),          # tie on ts -> id order
        (1, t0 + dt.timedelta(1), 3, "a"),
        (2, t0, 4, "a"), (2, t0 + dt.timedelta(1), 5, "a"),
    ]
    df = spark.createDataFrame(
        rows, "u long, ts timestamp, eid long, t string"
    )
    out = {(r["prev_type"], r["next_type"]): (r["cnt"], r["p_ppm"])
           for r in event_transitions(df, "u", "ts", "t", "eid").collect()}
    # user1: a->b (tie broken by eid), b->a; user2: a->a
    assert out == {
        ("a", "b"): (1, 500000), ("a", "a"): (1, 500000),
        ("b", "a"): (1, 1000000),
    }


def test_referential_profile_counts(spark):
    from job_post_similarity_spark.operators.profiling import (
        referential_profile,
    )

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (9,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = referential_profile(child, parent, "fk", "pk").collect()[0]
    assert (r["n_child"], r["n_orphans"], r["n_parents"],
            r["n_childless"]) == (4, 1, 3, 1)


def test_vocab_coverage_cuts(spark):
    from job_post_similarity_spark.operators.text_analysis import (
        vocab_coverage,
    )

    # token mass: x×6, y×3, z×1 (total 10)
    df = spark.createDataFrame(
        [("x x x x x x y y y z",)], "text string"
    )
    out = {r["threshold_ppm"]: (r["vocab_size"], r["covered_mass"])
           for r in vocab_coverage(df).collect()}
    assert out[500000] == (1, 6)    # 50% of 10 = 5 <= 6
    assert out[900000] == (2, 9)    # 90% -> x+y
    assert out[990000] == (3, 10)   # 99% -> ceil(9.9)=10 -> all


def test_referential_profile_null_keys_are_orphans(spark):
    from job_post_similarity_spark.operators.profiling import (
        referential_profile,
    )

    child = spark.createDataFrame(
        [(1,), (None,), (9,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (None,)], "pk long")
    r = referential_profile(child, parent, "fk", "pk").collect()[0]
    # left-anti semantics: NULL fk never matches -> orphan; NULL
    # parent key matches no child -> childless
    assert (r["n_child"], r["n_orphans"]) == (3, 2)
    assert (r["n_parents"], r["n_childless"]) == (2, 1)


def test_token_windows_udtf_edge_whitespace(spark):
    from job_post_similarity_spark.functions.udtf_ops import (
        token_windows,
    )

    rows = [(0, "\tfoo  bar\nbaz "), (1, "A\xa0B c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["doc_id"], r["win_idx"], r["win_text"], r["n_tokens"])
           for r in token_windows(spark, df, size=2)
           .orderBy("doc_id", "win_idx").collect()]
    # tab/newline split + empties dropped; NBSP (U+00A0) is NOT a
    # separator (ASCII-whitespace contract, matching the RE2/Java
    # \s+ oracle) -> "a\xa0b" stays one token
    assert got == [
        (0, 0, "foo bar", 2), (0, 1, "baz", 1),
        (1, 0, "a\xa0b c", 2),
    ]

def test_negative_samples_properties(spark):
    import pytest

    from job_post_similarity_spark.operators.sampling import (
        negative_samples,
    )

    df = spark.range(0, 40).withColumnRenamed("id", "vid")
    out = negative_samples(df, "vid", k=4, n=40).collect()
    assert len(out) == 160
    for r in out:
        assert 0 <= r["neg_id"] < 40 and r["neg_id"] != r["vid"]
    # deterministic across invocations/partitionings
    again = negative_samples(df.repartition(7), "vid", k=4, n=40).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    with pytest.raises(ValueError):
        negative_samples(spark.range(0, 1), "id", n=1)


def test_equi_depth_histogram_exact_cuts(spark):
    from job_post_similarity_spark.operators.profiling import (
        equi_depth_histogram,
    )

    df = spark.createDataFrame(
        [(float(v), v) for v in range(1, 21)], "v double, t long"
    )
    out = [(r["bucket"], r["cnt"], r["vmin"], r["vmax"])
           for r in equi_depth_histogram(df, "v", "t", buckets=4).collect()]
    assert out == [
        (1, 5, 1.0, 5.0), (2, 5, 6.0, 10.0),
        (3, 5, 11.0, 15.0), (4, 5, 16.0, 20.0),
    ]


def test_time_weighted_avg_step_function(spark):
    import datetime as dt

    from job_post_similarity_spark.operators.windows import (
        time_weighted_avg,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # value 10 for 10s, then 20 for 30s -> twa = (100+600)/40 = 17.5
        (1, t0, 10.0, 1),
        (1, t0 + dt.timedelta(seconds=10), 20.0, 2),
        (1, t0 + dt.timedelta(seconds=40), 99.0, 3),  # last: no duration
        (2, t0, 5.0, 4),  # single event -> no duration -> dropped
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, v double, eid long")
    out = {r["key"]: (r["twa"], r["total_seconds"])
           for r in time_weighted_avg(df, "u", "ts", "v", "eid").collect()}
    assert out == {1: (17.5, 40)}


def test_compact_files_reduces_file_count(spark, tmp_path):
    from pyspark.sql import functions as F

    from job_post_similarity_spark.sources.io import compact_files

    src = str(tmp_path / "shattered")
    dst = str(tmp_path / "compacted")
    spark.range(0, 10_000).withColumn(
        "payload", F.col("id").cast("string")
    ).repartition(64).write.parquet(src)
    import glob as g
    assert len(g.glob(src + "/*.parquet")) == 64
    n = compact_files(spark, src, dst, target_file_mb=128)
    assert n == 1  # tiny data -> single file
    assert len(g.glob(dst + "/*.parquet")) == 1
    a = spark.read.parquet(src).orderBy("id").collect()
    b = spark.read.parquet(dst).orderBy("id").collect()
    assert a == b


def test_top_tokens_by_group_ranks(spark):
    from job_post_similarity_spark.operators.text_analysis import (
        top_tokens_by_group,
    )

    rows = [("en", "a a a b"), ("en", "b c"), ("fr", "z z y")]
    df = spark.createDataFrame(rows, "lang string, text string")
    out = [(r["group"], r["token"], r["cnt"], r["rank"])
           for r in top_tokens_by_group(df, "lang", top_n=2).collect()]
    assert out == [
        ("en", "a", 3, 1), ("en", "b", 2, 2),
        ("fr", "z", 2, 1), ("fr", "y", 1, 2),
    ]


def test_nearest_centroid_classify_separable(spark):
    from job_post_similarity_spark.operators.knn import (
        nearest_centroid_classify,
    )

    rows = [
        (0, [1.0, 0.0], "x"), (1, [0.9, 0.1], "x"),
        (2, [0.0, 1.0], "y"), (3, [0.1, 0.9], "y"),
        (4, [0.8, 0.2], "x"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    out = {r["vec_id"]: r["pred_label"]
           for r in nearest_centroid_classify(df).collect()}
    # perfectly separable clusters -> every vector classified right
    assert out == {0: "x", 1: "x", 2: "y", 3: "y", 4: "x"}


def test_bpe_train_sennrich_example(spark):
    from job_post_similarity_spark.operators.text_analysis import (
        bpe_train,
    )

    # the classic corpus: low x5, lower x2, newest x6, widest x3
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    df = spark.createDataFrame([(text,)], "text string")
    merges = bpe_train(df, num_merges=4)
    # (e,s) and (s,t</w>) tie at 9 -> pair-asc tie-break picks (e,s);
    # after merging, (es,t</w>) hits 9; (l,o) leads the low family at
    # 7; then (e,w) at 6 beats (lo,w</w>) at 5 — "low" ends in w</w>,
    # so the lo+w pair only occurs in "lower" (hand-verified)
    assert merges == [
        ("e", "s"), ("es", "t</w>"), ("l", "o"), ("e", "w")
    ]


def test_bpe_roundtrip_token_counts(spark):
    from job_post_similarity_spark.operators.text_analysis import (
        bpe_apply,
        bpe_train,
    )

    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6)
    train = spark.createDataFrame([(text,)], "text string")
    merges = bpe_train(train, num_merges=10)
    docs = spark.createDataFrame(
        [
            (0, "low low newest"),   # all fully merged -> 3 tokens
            (1, "lowest"),           # unseen word: partial merges
            (2, "x9!"),              # outside normalization -> 1
            (3, None),               # null -> 0
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_apply(docs, merges).collect()}
    assert out[0] == 3 and out[2] == 1 and out[3] == 0
    # 'lowest' shares 'lo'+'w' and 'est</w>' pieces -> fewer than
    # its 6 characters, more than 1
    assert 1 < out[1] < 7
    # determinism across repartition
    again = {r["doc_id"]: r["n_bpe_tokens"]
             for r in bpe_apply(docs.repartition(3), merges).collect()}
    assert out == again


def test_pca_fit_recovers_planted_directions(spark):
    import numpy as np

    from job_post_similarity_spark.operators.knn import (
        pca_fit,
        pca_project,
    )

    rng = np.random.default_rng(7)
    # rank-2 structure in 6-d: strong axis e0, weaker axis e1
    n = 400
    a = rng.normal(0, 3.0, n)
    b = rng.normal(0, 1.0, n)
    noise = rng.normal(0, 0.01, (n, 6))
    x = np.zeros((n, 6))
    x[:, 0] = a
    x[:, 1] = b
    x += noise + np.array([5.0, -2.0, 0, 0, 0, 0])  # nonzero mean
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ).repartition(5)
    comps, mean, ev = pca_fit(df, k=2)
    assert np.allclose(mean, x.mean(axis=0), atol=1e-9)
    # top component ~ e0, second ~ e1 (deterministic positive sign)
    assert abs(comps[0][0]) > 0.99 and comps[0][0] > 0
    assert abs(comps[1][1]) > 0.99 and comps[1][1] > 0
    assert ev[0] > ev[1] > 0
    # projection matches numpy
    proj = {r["vec_id"]: r["pca"]
            for r in pca_project(df, comps, mean).collect()}
    want = (x - x.mean(axis=0)) @ comps.T
    got0 = np.array(proj[0])
    assert np.allclose(got0, want[0], atol=1e-9)
    # exact partial-sum equality across partitionings (decimal-free
    # but double sums of identical addends in different order — allow
    # tiny tolerance)
    comps2, mean2, ev2 = pca_fit(df.repartition(11), k=2)
    assert np.allclose(comps, comps2, atol=1e-8)


def test_containment_join_detects_subsets(spark):
    import itertools

    from job_post_similarity_spark.operators.dedup import (
        containment_join,
    )

    texts = [
        "alpha beta gamma delta epsilon",   # superset
        "alpha beta gamma delta",           # 4/4 contained in 0
        "alpha beta",                       # 2/2 contained in 0,1
        "zeta eta theta",
        "zeta eta theta iota kappa",        # 3 contains... no: 3 in 4
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    t_ppm = 800_000
    got = {(r["id_a"], r["id_b"]): r["containment_ppm"]
           for r in containment_join(df, threshold_ppm=t_ppm).collect()}
    sets = [set(t.split()) for t in texts]
    want = {}
    for i, j in itertools.permutations(range(len(texts)), 2):
        ppm = (1_000_000 * len(sets[i] & sets[j])) // len(sets[i])
        if ppm >= t_ppm:
            want[(i, j)] = ppm
    assert got == want
    assert got[(1, 0)] == 1_000_000 and got[(3, 4)] == 1_000_000
    # direction matters: the superset scores lower than the subset
    # (4 of its 5 tokens land in doc 1 — exactly at the threshold)
    assert got[(0, 1)] == 800_000
    assert (4, 3) not in got  # 3/5 = 0.6 < 0.8


# ------------------------------------------------ deterministic SemDeDup
def test_stratified_semantic_dedup_planted_duplicates(spark):
    """Planted near-identical vectors must land in one component with
    exactly one keeper (the min id); isolated vectors keep themselves."""
    from job_post_similarity_spark.operators.dedup import (
        stratified_semantic_dedup,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(20)]
    # plant two near-duplicates of vector 3 (tiny rotation, renormed)
    for nid in (20, 21):
        v = base[3] + rng.normal(scale=1e-3, size=16)
        v /= np.linalg.norm(v)
        rows.append((nid, v.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in
           stratified_semantic_dedup(df, k=4, threshold=0.95).collect()}
    assert len(out) == 22  # one row per input id, dup or not
    # the planted trio shares a component rooted at min id 3
    assert out[3]["component"] == 3 and out[3]["keep"]
    for nid in (20, 21):
        assert out[nid]["component"] == 3 and not out[nid]["keep"]
    # every component has exactly one keeper, and it's the min id
    comps: dict = {}
    for r in out.values():
        comps.setdefault(r["component"], []).append(r)
    for comp, members in comps.items():
        keepers = [m for m in members if m["keep"]]
        assert len(keepers) == 1
        assert keepers[0]["vec_id"] == comp == min(m["vec_id"] for m in members)
    # near-identical vectors must agree on the cluster assignment
    assert out[20]["cluster"] == out[3]["cluster"] == out[21]["cluster"]


def test_stratified_semantic_dedup_matches_lloyd_survivor_count(spark):
    """The deterministic tier and the Lloyd production tier agree on
    WHICH ids survive when the duplicate structure is unambiguous
    (dups are ~identical, everything else is far below threshold)."""
    from job_post_similarity_spark.operators.dedup import (
        semantic_dedup,
        stratified_semantic_dedup,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(size=(30, 12))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(30)]
    rows += [(30 + j, base[j].tolist()) for j in range(5)]  # exact dups
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    det = stratified_semantic_dedup(df, k=4, threshold=0.999)
    det_kept = {r["vec_id"] for r in det.collect() if r["keep"]}
    prod = semantic_dedup(df, threshold=0.999, n_centroids=4)
    prod_kept = {r["vec_id"] for r in prod.collect()}
    assert det_kept == prod_kept == set(range(30))


# --------------------------------------------------------------- DSIR
def test_dsir_weights_matches_python_reference(spark):
    """w6 must equal an independently-computed integer micro-log
    importance ratio, and target-like docs must outrank off-domain
    ones."""
    import hashlib

    from job_post_similarity_spark.operators.curation import dsir_weights

    docs = [
        (0, "the quick brown fox jumps"),
        (1, "the lazy dog sleeps"),
        (2, "uno dos tres cuatro cinco"),
        (3, "seis siete ocho nueve"),
        (4, "the quick dog"),
        (5, None),  # null text: dropped
        (6, "   "),  # whitespace-only: no tokens, dropped
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    target = df.filter(F.col("doc_id") < 2)  # "english" slice
    got = {r["doc_id"]: (r["n_tokens"], r["w6"])
           for r in dsir_weights(df, target, n_buckets=64).collect()}
    assert set(got) == {0, 1, 2, 3, 4}

    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:14], 16) % 64

    toks = {i: t.lower().split() for i, t in docs if t and t.split()}
    rawb = [bucket(t) for ts in toks.values() for t in ts]
    tgtb = [bucket(t) for i in (0, 1) for t in toks[i]]
    k, B = 0.5, 64

    def lp6(bs, b):
        c = bs.count(b)
        return int(np.round(math.log((c + k) / (len(bs) + k * B)) * 1e6))

    for i, ts in toks.items():
        w6 = sum(lp6(tgtb, bucket(t)) - lp6(rawb, bucket(t)) for t in ts)
        assert got[i] == (len(ts), w6), i
    # ranking property (robust even at this tiny smoothing-dominated
    # scale): every in-domain doc outranks every off-domain doc
    # per-token, and off-domain docs are strongly negative (their
    # tokens hit the target floor probability)
    per_tok = {i: got[i][1] / got[i][0] for i in got}
    assert min(per_tok[i] for i in (0, 1, 4)) > max(
        per_tok[i] for i in (2, 3)
    )
    assert got[2][1] < 0 and got[3][1] < 0


# ------------------------------------------------- int8 quantization
def test_quantize_int8_roundtrip_error_bound(spark):
    """Codes stay in [-127,127]; per-component reconstruction error
    is at most half a quantization step (scale/254 + fp slack); the
    max-|x| component of every dimension hits ±127 exactly."""
    from job_post_similarity_spark.operators.knn import (
        dequantize_int8,
        int8_scales,
        quantize_int8,
    )

    rng = np.random.default_rng(3)
    x = rng.normal(size=(50, 8))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    scales = int8_scales(df)
    assert scales == [float(m) for m in np.abs(x).max(axis=0)]
    out = dequantize_int8(quantize_int8(df, scales=scales), scales)
    rows = {r["vec_id"]: (r["codes"], r["embedding_sq8"])
            for r in out.collect()}
    hit_extreme = [False] * 8
    for i, (codes, recon) in rows.items():
        assert all(-127 <= c <= 127 for c in codes)
        for p, (c, xh) in enumerate(zip(codes, recon)):
            assert abs(xh - x[i][p]) <= scales[p] / 254 + 1e-12
            if abs(c) == 127:
                hit_extreme[p] = True
    assert all(hit_extreme)


def test_quantize_int8_search_parity(spark):
    """Top-1 cosine neighbor over dequantized SQ8 vectors matches the
    exact top-1 for the overwhelming majority of queries (the serving
    guarantee the 4x compression is traded against)."""
    from job_post_similarity_spark.functions import vectors as V
    from job_post_similarity_spark.operators.knn import (
        dequantize_int8,
        int8_scales,
        quantize_int8,
    )

    rng = np.random.default_rng(5)
    x = rng.normal(size=(80, 24))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    scales = int8_scales(df)
    deq = dequantize_int8(quantize_int8(df, scales=scales), scales)
    xr = np.array(
        [r["embedding_sq8"] for r in deq.orderBy("vec_id").collect()]
    )
    sims_exact = x @ x.T
    sims_sq8 = xr @ xr.T
    np.fill_diagonal(sims_exact, -2)
    np.fill_diagonal(sims_sq8, -2)
    agree = (sims_exact.argmax(axis=1) == sims_sq8.argmax(axis=1)).mean()
    assert agree >= 0.9


# ------------------------------------------- leakage-safe splitting
def test_leakage_safe_split_group_cohesion(spark):
    """All members of a group land in one fold; fold proportions are
    near the weights; the split is stable under repartitioning and
    row-order changes."""
    from job_post_similarity_spark.operators.sampling import (
        leakage_safe_split,
    )

    rows = [(i, f"g{i % 200}") for i in range(1000)]
    df = spark.createDataFrame(rows, "row_id long, fam string")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = leakage_safe_split(df, "fam", w).collect()
    by_fam: dict = {}
    for r in out:
        by_fam.setdefault(r["fam"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_fam.values())
    from collections import Counter
    fold_of = {fam: next(iter(s)) for fam, s in by_fam.items()}
    frac = Counter(fold_of.values())
    assert 0.6 < frac["train"] / 200 < 0.95
    assert frac["val"] > 0 and frac["test"] > 0
    # order/partitioning independence
    again = leakage_safe_split(df.repartition(7).orderBy(F.desc("row_id")), "fam", w)
    assert {(r["row_id"], r["split"]) for r in again.collect()} == {
        (r["row_id"], r["split"]) for r in out
    }


# --------------------------------------------- expectation report
def test_expectation_report_rules_and_null_hostility(spark):
    from job_post_similarity_spark.operators.profiling import (
        expectation_report,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, None), (4, 100.0)],
        "id long, amount double",
    )
    out = {r["rule"]: r for r in expectation_report(
        df,
        {
            "amount_positive": F.col("amount") > 0,
            "amount_small": "amount < 50",
            "id_present": "id IS NOT NULL",
        },
    ).collect()}
    # NULL predicate counts as a violation (null-hostile semantics)
    assert out["amount_positive"]["n_violations"] == 2  # -3 and NULL
    assert out["amount_small"]["n_violations"] == 2     # 100 and NULL
    assert out["id_present"]["n_violations"] == 0
    assert out["id_present"]["pass"] is True
    assert out["amount_positive"]["pass"] is False
    assert all(r["n_rows"] == 4 for r in out.values())
    # single-scan shape: no join, exactly one aggregate pair
    plan = expectation_report(df, {"a": "amount > 0"})._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan


def test_truncate_tokens_budget_and_nulls(spark):
    from job_post_similarity_spark.operators.preprocess import (
        truncate_tokens,
    )

    df = spark.createDataFrame(
        [(0, "A  b\tc d e"), (1, "one two"), (2, None), (3, "   ")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           truncate_tokens(df, max_tokens=3).collect()}
    assert out[0]["text_trunc"] == "a b c"
    assert out[0]["n_tokens_kept"] == 3
    assert out[1]["text_trunc"] == "one two"
    assert out[1]["n_tokens_kept"] == 2
    assert out[2]["text_trunc"] is None
    assert out[2]["n_tokens_kept"] == 0  # least() null-skip guarded
    assert out[3]["text_trunc"] == ""
    assert out[3]["n_tokens_kept"] == 0


# ------------------------------------------------------- PSI drift
def test_psi_drift_detects_shift(spark):
    """Identical distributions score ~0; a shifted distribution
    scores high; psi6 matches an independent numpy computation."""
    from job_post_similarity_spark.operators.profiling import psi_drift

    rng = np.random.default_rng(9)
    ref_vals = rng.uniform(0, 100, 2000)
    same_vals = rng.uniform(0, 100, 2000)
    shifted_vals = rng.uniform(50, 150, 2000)
    mk = lambda v: spark.createDataFrame(
        [(float(x),) for x in v], "x double"
    )
    ref = mk(ref_vals)

    out_same = psi_drift(ref, mk(same_vals), "x", n_bins=10).collect()
    out_shift = psi_drift(ref, mk(shifted_vals), "x", n_bins=10).collect()
    psi_same = sum(r["psi6"] for r in out_same) / 1e6
    psi_shift = sum(r["psi6"] for r in out_shift) / 1e6
    assert psi_same < 0.02
    assert psi_shift > 0.25  # industry "drifted" threshold

    # independent reference for the shifted case
    mn, mx = ref_vals.min(), ref_vals.max()
    width = (mx - mn) / 10
    k = 0.5

    def bins(v):
        b = np.clip(((v - mn) / width).astype(int), 0, 9)
        return np.bincount(b, minlength=10)

    cr, cn = bins(ref_vals), bins(shifted_vals)
    p = (cr + k) / (cr.sum() + k * 10)
    q = (cn + k) / (cn.sum() + k * 10)
    want = np.round((q - p) * np.log(q / p) * 1e6).astype(int)
    got = {r["bin"]: r["psi6"] for r in out_shift}
    for b in range(10):
        assert got[b] == want[b], b
    # all bins present even when one side is empty there
    assert sorted(got) == list(range(10))


def test_psi_drift_rejects_degenerate_reference(spark):
    from job_post_similarity_spark.operators.profiling import psi_drift

    const = spark.createDataFrame([(1.0,), (1.0,)], "x double")
    with pytest.raises(ValueError):
        psi_drift(const, const, "x")


# --------------------------------------- temperature mixture weights
def test_temperature_mixture_weights_properties(spark):
    from job_post_similarity_spark.operators.sampling import (
        temperature_mixture_weights,
    )

    rows = (
        [(i, "big") for i in range(900)]
        + [(i, "mid") for i in range(90)]
        + [(i, "small") for i in range(10)]
        + [(0, None)]  # null source excluded
    )
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = {r["source"]: r for r in
           temperature_mixture_weights(df, "src", alpha=0.7).collect()}
    assert set(out) == {"big", "mid", "small"}
    # weights sum to ~1e6 (floor-div remainder only)
    total = sum(r["weight_ppm"] for r in out.values())
    assert 1_000_000 - 3 <= total <= 1_000_000
    # temperature flattens: small source gets MORE than natural share,
    # big gets less
    assert out["small"]["weight_ppm"] > 10_000
    assert out["big"]["weight_ppm"] < 900_000
    # big source is downsampled (rate < 1), small is saturated
    assert out["big"]["rate_ppm"] < 1_000_000
    assert out["small"]["rate_ppm"] == 1_000_000
    # alpha=1 recovers natural proportions exactly (ppm floor)
    nat = {r["source"]: r["weight_ppm"] for r in
           temperature_mixture_weights(df, "src", alpha=1.0).collect()}
    assert nat["big"] == 1_000_000 * 900_000_000 // 1_000_000_000


def test_sentence_split_segmentation(spark):
    from job_post_similarity_spark.operators.text_analysis import (
        sentence_split,
    )

    df = spark.createDataFrame(
        [
            (0, "Hello world. How are you? Fine!"),
            (1, "no terminator here"),
            (2, "a.. b"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    got = [
        (r["doc_id"], r["sent_idx"], r["sentence"])
        for r in sentence_split(df).orderBy("doc_id", "sent_idx").collect()
    ]
    assert got == [
        (0, 0, "Hello world."),
        (0, 1, "How are you?"),
        (0, 2, "Fine!"),
        (1, 0, "no terminator here"),
        (2, 0, "a.."),
        (2, 1, "b"),
    ]


# ------------------------------------------------------------ pivot
def test_pivot_table_count_and_sum(spark):
    from job_post_similarity_spark.operators.preprocess import pivot_table

    df = spark.createDataFrame(
        [
            ("a", "x", 1.5),
            ("a", "x", 2.5),
            ("a", "y", 10.0),
            ("b", "y", 3.0),
            ("b", "z", 99.0),  # z not in values list: dropped
        ],
        "row string, col string, v double",
    )
    cnt = {r["row"]: (r["x"], r["y"]) for r in
           pivot_table(df, "row", "col", ["x", "y"]).collect()}
    assert cnt == {"a": (2, 1), "b": (0, 1)}
    sm = {r["row"]: (r["x"], r["y"]) for r in
          pivot_table(df, "row", "col", ["x", "y"],
                      agg_col="v", agg="sum").collect()}
    assert sm == {"a": (4.0, 10.0), "b": (0.0, 3.0)}
    with pytest.raises(ValueError):
        pivot_table(df, "row", "col", ["x"], agg="sum")
    with pytest.raises(ValueError):
        pivot_table(df, "row", "col", ["x"], agg="median")
    # single-aggregate shape: no Expand, no join
    plan = pivot_table(df, "row", "col", ["x", "y"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan and "Expand" not in plan


# --------------------------------------------------- analyze table
def test_analyze_table_stats(spark):
    from job_post_similarity_spark.operators.profiling import (
        analyze_table,
    )

    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "a", None), (3, None, -1.5), (3, "b", 2.0)],
        "id long, s string, v double",
    )
    out = {r["column"]: r for r in analyze_table(df).collect()}
    assert set(out) == {"id", "s", "v"}
    assert all(r["n_rows"] == 4 for r in out.values())
    assert out["id"]["n_nulls"] == 0 and out["id"]["n_distinct"] == 3
    assert out["id"]["min_d"] == 1.0 and out["id"]["max_d"] == 3.0
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_d"] is None and out["s"]["max_d"] is None
    assert out["v"]["n_nulls"] == 1 and out["v"]["n_distinct"] == 2
    assert out["v"]["min_d"] == -1.5 and out["v"]["max_d"] == 2.0
    # one-scan shape: no joins
    plan = analyze_table(df)._jdf.queryExecution().executedPlan(
    ).toString()
    assert "Join" not in plan


def test_connected_components_driver_tier_equals_distributed(spark):
    """The small-graph union-find fast tier must produce exactly the
    distributed min-label fixpoint (driver_budget=0 forces it)."""
    from job_post_similarity_spark.operators.dedup import (
        connected_components,
    )

    rng = np.random.default_rng(13)
    edges = {(int(a), int(b)) for a, b in rng.integers(0, 60, (80, 2))
             if a != b}
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges],
        "id1 long, id2 long",
    )
    fast = {(r["id"], r["component"])
            for r in connected_components(pairs).collect()}
    dist = {(r["id"], r["component"])
            for r in connected_components(
                pairs, driver_budget=0).collect()}
    assert fast == dist and fast


# ------------------------------------------------------- UDAF tier
def test_grouped_agg_udafs(spark):
    """GROUPED_AGG pandas UDFs: exact median + trimmed mean, SQL null
    semantics, and composition with Window partitions."""
    from pyspark.sql.window import Window

    from job_post_similarity_spark.functions.udaf_ops import (
        median_udaf,
        trimmed_mean_udaf,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", 100.0), ("a", None),
         ("b", 5.0), ("b", 7.0), ("c", None)],
        "g string, v double",
    )
    med = {r["g"]: r["m"] for r in
           df.groupBy("g").agg(median_udaf("v").alias("m")).collect()}
    assert med["a"] == 3.0          # nulls skipped
    assert med["b"] == 6.0          # even count: (5+7)/2
    assert med["c"] is None         # all-null group
    tm = {r["g"]: r["m"] for r in
          df.groupBy("g").agg(
              trimmed_mean_udaf("v").alias("m")).collect()}
    assert tm["b"] == 6.0
    assert tm["c"] is None
    # window composition: per-partition constant
    w = Window.partitionBy("g")
    out = df.withColumn("gm", median_udaf("v").over(w)).collect()
    for r in out:
        assert r["gm"] == med[r["g"]]


# ---------------------------------------------- text & binary sources
def test_text_lines_roundtrip(spark, tmp_path):
    from job_post_similarity_spark.sources.io import (
        read_text_lines,
        write_text_lines,
    )

    df = spark.createDataFrame(
        [("first line",), ("second line",), ("",)], "value string"
    )
    p = str(tmp_path / "lines")
    write_text_lines(df, p)
    back = read_text_lines(spark, p)
    assert sorted(r["value"] for r in back.collect()) == [
        "", "first line", "second line",
    ]
    withf = read_text_lines(spark, p, with_file=True)
    assert set(withf.columns) == {"value", "source_file"}
    assert all(r["source_file"] for r in withf.collect())


def test_binary_files_source(spark, tmp_path):
    from job_post_similarity_spark.sources.io import read_binary_files

    payload_a = b"\x89PNG\r\n\x1a\n" + bytes(range(32))
    payload_b = b"RIFFxxxxWAVE" + bytes(64)
    (tmp_path / "a.png").write_bytes(payload_a)
    (tmp_path / "b.wav").write_bytes(payload_b)
    (tmp_path / "note.txt").write_text("not binary media")
    df = read_binary_files(spark, str(tmp_path))
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.png", "b.wav", "note.txt"}
    assert bytes(rows["a.png"]["content"]) == payload_a
    assert rows["b.wav"]["length"] == len(payload_b)
    only_png = read_binary_files(spark, str(tmp_path), glob="*.png")
    assert [r["path"].rsplit("/", 1)[-1] for r in only_png.collect()] == [
        "a.png"
    ]


# ------------------------------------------------ correlation matrix
def test_corr_matrix_matches_numpy(spark):
    from job_post_similarity_spark.operators.profiling import corr_matrix

    rng = np.random.default_rng(21)
    x = rng.normal(size=200)
    y = 2.0 * x + rng.normal(scale=0.1, size=200)   # strongly correlated
    z = rng.normal(size=200)                         # independent
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)]
    rows.append((None, 1.0, 1.0))  # null excluded pairwise
    df = spark.createDataFrame(rows, "x double, y double, z double")
    got = {(r["col_a"], r["col_b"]): r for r in
           corr_matrix(df, ["x", "y", "z"]).collect()}
    assert got[("x", "y")]["n_pairs"] == 200
    assert got[("y", "z")]["n_pairs"] == 201
    want_xy = np.corrcoef(x, y)[0, 1]
    assert abs(got[("x", "y")]["corr"] - round(want_xy, 6)) < 2e-6
    assert abs(got[("x", "z")]["corr"]) < 0.2
    # constant column: degenerate variance -> NULL
    cdf = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0)], "a double, b double"
    )
    out = corr_matrix(cdf, ["a", "b"]).collect()[0]
    assert out["corr"] is None


# ------------------------------------------------ versioned tables
def test_versioned_table_time_travel_and_vacuum(spark, tmp_path):
    from job_post_similarity_spark.sources.versioned import (
        list_versions,
        read_version,
        vacuum,
        write_version,
    )

    t = str(tmp_path / "tbl")
    d1 = spark.range(3).withColumnRenamed("id", "k")
    d2 = spark.range(5).withColumnRenamed("id", "k")
    assert write_version(d1, t, note="initial") == 1
    assert write_version(d2, t) == 2
    assert read_version(spark, t).count() == 5       # latest
    assert read_version(spark, t, 1).count() == 3    # time travel
    hist = list_versions(t)
    assert [h["version"] for h in hist] == [1, 2]
    assert hist[0]["note"] == "initial"
    assert vacuum(t, keep_last=1) == [1]
    with pytest.raises(ValueError):
        read_version(spark, t, 1)
    assert read_version(spark, t).count() == 5
    # next write continues the version sequence after vacuum
    assert write_version(d1, t) == 3
    assert read_version(spark, t).count() == 3


# ------------------------------------- sorted-neighborhood blocking
def test_sorted_neighborhood_window_and_verify(spark):
    from job_post_similarity_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    names = ["anna", "annb", "annz", "bob", "bobb", "zed"]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "rid long, name string"
    )
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in
           sorted_neighborhood_pairs(
               df, "name", "rid", window=3, max_dist=2).collect()}
    # anna-annb adjacent (dist 1); annb-annz (1); anna-annz window 2
    assert got[(0, 1)] == 1 and got[(1, 2)] == 1 and got[(0, 2)] == 1
    assert got[(3, 4)] == 1  # bob-bobb
    # annz-bob adjacent in sort order but dist 4 -> filtered
    assert (2, 3) not in got
    # zed only neighbors bobb at dist>2
    assert not any(5 in p for p in got)
    # without verify: all window pairs present
    allp = sorted_neighborhood_pairs(df, "name", "rid", window=3)
    assert allp.count() == 4 + 3 + 2  # n-1 + n-2 window-2 chains
    assert "dist" not in allp.columns


def test_weighted_sample_proportional_and_deterministic(spark):
    from job_post_similarity_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, w double")
    out = weighted_sample(df, "w", 100, "k")
    got = {r["k"] for r in out.collect()}
    assert len(got) == 100
    # heavy keys (w=100, 5% of rows) should be strongly over-represented
    heavy = sum(1 for k in got if k < 50)
    assert heavy >= 30
    # stable under repartitioning
    again = {r["k"] for r in
             weighted_sample(df.repartition(13), "w", 100, "k").collect()}
    assert got == again
    # zero/null weights excluded
    z = spark.createDataFrame(
        [(1, 0.0), (2, None), (3, 2.0)], "k long, w double"
    )
    assert {r["k"] for r in
            weighted_sample(z, "w", 10, "k").collect()} == {3}


# ---------------------------------------- asof forward / tolerance
def test_asof_join_forward_and_tolerance(spark):
    import datetime as dt

    from job_post_similarity_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1)
    mk = lambda s: t0 + dt.timedelta(seconds=s)
    left = spark.createDataFrame(
        [(1, "u", mk(0)), (2, "u", mk(100)), (3, "u", mk(500)),
         (4, "v", mk(0))],
        "lid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", mk(50), 10.0), ("u", mk(200), 20.0)],
        "k string, ts timestamp, val double",
    )
    fwd = {r["lid"]: r["val_asof"] for r in asof_join(
        left, right, "k", "ts", ["val"], direction="forward"
    ).collect()}
    assert fwd == {1: 10.0, 2: 20.0, 3: None, 4: None}
    # tolerance: lid 2 -> next right at +100s; tolerance 50s kills it
    tol = {r["lid"]: r["val_asof"] for r in asof_join(
        left, right, "k", "ts", ["val"],
        direction="forward", tolerance_seconds=50,
    ).collect()}
    assert tol == {1: 10.0, 2: None, 3: None, 4: None}
    # backward with tolerance: lid 3 matched right at -300s, cut at 60
    back = {r["lid"]: r["val_asof"] for r in asof_join(
        left, right, "k", "ts", ["val"],
        tolerance_seconds=60,
    ).collect()}
    assert back == {1: None, 2: 10.0, 3: None, 4: None}
    with pytest.raises(ValueError):
        asof_join(left, right, "k", "ts", ["val"], direction="nearest")


# ---------------------------------------------- transitive closure
def test_transitive_closure_paths_and_cycles(spark):
    from job_post_similarity_spark.operators.graph import (
        transitive_closure,
    )

    # chain 1->2->3->4 plus a cycle 10<->11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 10)],
        "src long, dst long",
    )
    got = {(r["src"], r["dst"]): r["depth"]
           for r in transitive_closure(edges).collect()}
    assert got[(1, 2)] == 1 and got[(1, 3)] == 2 and got[(1, 4)] == 3
    assert got[(2, 4)] == 2
    # cycle: each reaches the other at depth 1, never itself
    assert got[(10, 11)] == 1 and got[(11, 10)] == 1
    assert (10, 10) not in got and (11, 11) not in got
    # shortest depth wins when a shortcut exists
    sc = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    got2 = {(r["src"], r["dst"]): r["depth"]
            for r in transitive_closure(sc).collect()}
    assert got2[(1, 3)] == 1
    # max_depth truncates
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    got3 = transitive_closure(chain, max_depth=2).collect()
    assert max(r["depth"] for r in got3) == 2


def test_linear_fit_recovers_planted_line(spark):
    from job_post_similarity_spark.operators.profiling import linear_fit

    rows = [("a", float(x), 3.0 * x + 7.0) for x in range(20)]
    rows += [("b", float(x), -0.5 * x + 2.0) for x in range(10)]
    rows += [("c", 1.0, 5.0)]            # single point: NULLs
    rows += [("d", 2.0, 1.0), ("d", 2.0, 9.0)]  # zero x-variance
    rows += [("a", None, 99.0)]          # null x excluded
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["group"]: r for r in linear_fit(df, "g", "x", "y").collect()}
    assert got["a"]["n"] == 20
    assert got["a"]["slope"] == 3.0 and got["a"]["intercept"] == 7.0
    assert got["b"]["slope"] == -0.5 and got["b"]["intercept"] == 2.0
    assert got["c"]["slope"] is None
    assert got["d"]["slope"] is None and got["d"]["n"] == 2


# ------------------------------------------- ingest robustness
def test_read_csv_robust_quarantines_bad_rows(spark, tmp_path):
    from pyspark.sql import types as T

    from job_post_similarity_spark.sources.io import read_csv_robust

    p = tmp_path / "in.csv"
    p.write_text(
        "id,qty,name\n"
        "1,10,alpha\n"
        "2,notanumber,beta\n"   # qty fails the int cast
        "3,30,gamma\n"
    )
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("qty", T.IntegerType()),
        T.StructField("name", T.StringType()),
    ])
    df = read_csv_robust(spark, str(p), schema).cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert {r["id"] for r in good.collect()} == {1, 3}
    brows = bad.collect()
    assert len(brows) == 1
    assert "notanumber" in brows[0]["_corrupt_record"]
    assert brows[0]["qty"] is None


def test_read_parquet_evolved_merges_added_column(spark, tmp_path):
    from job_post_similarity_spark.sources.io import read_parquet_evolved

    base = str(tmp_path / "tbl")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        base + "/part=old"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(base + "/part=new")
    df = read_parquet_evolved(spark, base)
    assert set(df.columns) >= {"id", "name", "score"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] is None   # old file: evolved column nulls
    assert rows[2]["score"] == 9.5


# --------------------------------------------- pooling & MMR rerank
def test_mean_pool_exact_and_normalized(spark):
    from job_post_similarity_spark.operators.knn import mean_pool

    rows = [
        ("a", [1.0, 2.0, 3.0]),
        ("a", [3.0, 2.0, 1.0]),
        ("b", [0.0, 0.0, 2.0]),
    ]
    df = spark.createDataFrame(rows, "g string, embedding array<double>")
    got = {r["group"]: r for r in mean_pool(df, "g").collect()}
    assert got["a"]["n_vecs"] == 2 and got["a"]["pooled"] == [2.0, 2.0, 2.0]
    assert got["b"]["pooled"] == [0.0, 0.0, 2.0]
    normed = {r["group"]: r["pooled"]
              for r in mean_pool(df, "g", normalize=True).collect()}
    assert abs(sum(x * x for x in normed["a"]) - 1.0) < 1e-12
    assert normed["b"] == [0.0, 0.0, 1.0]


def test_mmr_rerank_diversifies(spark):
    from job_post_similarity_spark.operators.knn import mmr_rerank

    # candidate pool for one query: two near-identical high scorers
    # and one diverse mid scorer; MMR at low lambda must interleave
    v1 = [1.0, 0.0]
    v1b = [0.9999, 0.0141]  # ~same direction as v1
    v2 = [0.0, 1.0]
    rows = [
        (1, 10, v1, 0.95),
        (1, 11, v1b, 0.94),
        (1, 12, v2, 0.80),
    ]
    cand = spark.createDataFrame(
        rows,
        "query_id long, neighbor_id long, embedding array<double>,"
        " similarity double",
    )
    picks = [r["neighbor_id"] for r in
             mmr_rerank(cand, k=3, lam=0.5).collect()]
    # first pick: best relevance; second: the DIVERSE item despite
    # lower relevance; duplicate direction drops to last
    assert picks == [10, 12, 11]
    # high lambda reduces to plain relevance order
    rel = [r["neighbor_id"] for r in
           mmr_rerank(cand, k=3, lam=1.0).collect()]
    assert rel == [10, 11, 12]
    ranks = [r["mmr_rank"] for r in
             mmr_rerank(cand, k=2, lam=0.5).collect()]
    assert ranks == [1, 2]


# --------------------------------------------- evaluation metrics
def test_ranking_metrics_hand_computed(spark):
    import math

    from job_post_similarity_spark.operators.metrics import (
        ranking_metrics,
    )

    rows = [
        # q1: relevant at ranks 1 and 3 of 4
        (1, 1, True), (1, 2, False), (1, 3, True), (1, 4, False),
        # q2: nothing relevant
        (2, 1, False), (2, 2, False),
        # q3: relevant only at rank 2
        (3, 1, False), (3, 2, True),
    ]
    df = spark.createDataFrame(rows, "query_id long, rank int, relevant boolean")
    got = {r["query"]: r for r in
           ranking_metrics(df, k=10).collect()}
    g = lambda r: int(round(1e6 / math.log2(r + 1)))
    assert got[1]["hit_at_k"] == 1 and got[1]["rr_ppm"] == 1_000_000
    assert got[1]["dcg6"] == g(1) + g(3)
    assert got[1]["idcg6"] == g(1) + g(2)
    assert got[1]["ndcg_ppm"] == (
        1_000_000 * (g(1) + g(3)) // (g(1) + g(2))
    )
    assert got[2]["hit_at_k"] == 0 and got[2]["rr_ppm"] == 0
    assert got[2]["ndcg_ppm"] == 0 and got[2]["idcg6"] == 0
    assert got[3]["rr_ppm"] == 500_000
    assert got[3]["dcg6"] == g(2) and got[3]["idcg6"] == g(1)


def test_classification_report_per_class(spark):
    from job_post_similarity_spark.operators.metrics import (
        classification_report,
    )

    rows = [
        ("a", "a"), ("a", "a"), ("a", "b"),   # a: tp 2, fn 1
        ("b", "b"),                           # b: tp 1, fp 1 (from a)
        ("c", "a"),                           # c: never predicted
    ]
    df = spark.createDataFrame(rows, "label string, pred_label string")
    got = {r["class"]: r for r in classification_report(df).collect()}
    assert got["a"]["tp"] == 2 and got["a"]["fn"] == 1 and got["a"]["fp"] == 1
    assert got["a"]["precision_ppm"] == 1_000_000 * 2 // 3
    assert got["a"]["recall_ppm"] == 1_000_000 * 2 // 3
    assert got["b"]["precision_ppm"] == 500_000
    assert got["b"]["recall_ppm"] == 1_000_000
    # never-predicted class: precision 0 by zero-division convention
    assert got["c"]["tp"] == 0 and got["c"]["precision_ppm"] == 0
    assert got["c"]["recall_ppm"] == 0 and got["c"]["support"] == 1
    # F1 from raw counts
    assert got["a"]["f1_ppm"] == 2 * 1_000_000 * 2 // (2 * 2 + 1 + 1)


# ---------------------------------------------- label propagation
def test_label_propagation_majority_and_seeds(spark):
    from job_post_similarity_spark.operators.graph import (
        label_propagation,
    )

    # star: center 0 connected to seeds 1('a'), 2('a'), 3('b');
    # leaf 4 hangs off center
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4)], "src long, dst long"
    )
    seeds = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id long, label string"
    )
    got = {r["id"]: (r["label"], r["hops"]) for r in
           label_propagation(edges, seeds, rounds=2).collect()}
    assert got[1] == ("a", 0) and got[3] == ("b", 0)  # seeds immutable
    assert got[0] == ("a", 1)   # majority a over b
    assert got[4] == ("a", 2)   # second hop through center
    # tie-break: equal votes -> smallest label
    t_edges = spark.createDataFrame([(9, 1), (9, 3)], "src long, dst long")
    t = {r["id"]: r["label"] for r in
         label_propagation(t_edges, seeds, rounds=1).collect()}
    assert t[9] == "a"


# ------------------------------------------------- feature hashing
def test_feature_hash_namespaces_and_nulls(spark):
    import hashlib

    from job_post_similarity_spark.functions.features import feature_hash

    df = spark.createDataFrame(
        [(1, "x", "x"), (2, None, "x"), (3, "x", None)],
        "rid long, a string, b string",
    )
    out = {r["rid"]: r["v"] for r in df.select(
        "rid", feature_hash(["a", "b"], 16).alias("v")).collect()}

    def bucket(name, val):
        return int(hashlib.md5(
            f"{name}={val}".encode()).hexdigest()[:14], 16) % 16

    ba, bb = bucket("a", "x"), bucket("b", "x")
    # same VALUE in different columns -> independent namespaced buckets
    assert ba != bb  # (holds for this fixture; namespacing property)
    assert sum(out[1]) == 2 and out[1][ba] == 1 and out[1][bb] == 1
    assert sum(out[2]) == 1 and out[2][bb] == 1  # null a drops out
    assert sum(out[3]) == 1 and out[3][ba] == 1
    assert all(len(v) == 16 for v in out.values())


# ------------------------------------------ custom Python DataSource
def test_custom_python_datasource(spark):
    from job_post_similarity_spark.sources.pyds import (
        SyntheticDocsDataSource,
        SyntheticDocsReader,
    )

    spark.dataSource.register(SyntheticDocsDataSource)
    df = (
        spark.read.format("synthetic_docs")
        .option("rows", 100)
        .option("partitions", 4)
        .load()
    )
    assert df.schema.simpleString() == "struct<doc_id:bigint,text:string>"
    rows = df.collect()
    assert len(rows) == 100
    assert {r["doc_id"] for r in rows} == set(range(100))
    assert df.rdd.getNumPartitions() == 4
    # deterministic: re-read produces identical content
    again = (
        spark.read.format("synthetic_docs")
        .option("rows", 100)
        .option("partitions", 7)  # different parallelism, same rows
        .load()
        .collect()
    )
    assert {tuple(r) for r in rows} == {tuple(r) for r in again}
    # local generator agrees with the distributed read
    local = list(
        SyntheticDocsReader({"rows": "100", "partitions": "1"}).read(
            type("P", (), {"start": 0, "end": 100})()
        )
    )
    assert {tuple(r) for r in rows} == set(local)


# ---------------------------------------------------- dense ids
def test_assign_dense_ids_total_order_and_partitioning(spark):
    from job_post_similarity_spark.operators.preprocess import (
        assign_dense_ids,
    )

    rng = np.random.default_rng(31)
    keys = rng.permutation(500).tolist()
    df = spark.createDataFrame(
        [(int(k), f"v{k}") for k in keys], "k long, v string"
    ).repartition(11)
    out = assign_dense_ids(df, ["k"]).collect()
    assert len(out) == 500
    by_key = {r["k"]: r["row_id"] for r in out}
    # dense 0..n-1 in key order regardless of input partitioning
    assert sorted(by_key.values()) == list(range(500))
    assert all(by_key[k] == k for k in range(500))
    # payload columns ride through
    assert all(r["v"] == f"v{r['k']}" for r in out)


def test_optimize_version_and_metadata_column(spark, tmp_path):
    """OPTIMIZE commits a new compacted snapshot (old version still
    readable); parquet scans expose file provenance via the hidden
    _metadata column."""
    from job_post_similarity_spark.sources.versioned import (
        list_versions,
        optimize_version,
        read_version,
        write_version,
    )

    t = str(tmp_path / "tbl")
    df = spark.range(1000).select(
        F.col("id").alias("a"), (999 - F.col("id")).alias("b")
    ).repartition(16)
    assert write_version(df, t) == 1
    v2 = optimize_version(spark, t, zorder_by=("a", "b"))
    assert v2 == 2
    assert read_version(spark, t).count() == 1000
    assert read_version(spark, t, 1).count() == 1000
    assert "zorder" in list_versions(t)[-1]["note"]
    # hidden _metadata: file provenance on any parquet scan
    meta = read_version(spark, t).select(
        "a", F.col("_metadata.file_path").alias("src")
    ).limit(5).collect()
    assert all(r["src"].endswith(".parquet") for r in meta)
    assert all("v=2" in r["src"] for r in meta)


# ------------------------------------------------ SCD2 point-in-time
def test_scd2_lookup_resolves_versions(spark):
    import datetime as dt

    from job_post_similarity_spark.operators.cdc import (
        scd2_build,
        scd2_lookup,
    )

    t0 = dt.datetime(2024, 1, 1)
    mk = lambda m: t0 + dt.timedelta(minutes=m)
    # user u: type A at t0..t10, B from t10
    chg = spark.createDataFrame(
        [(1, "u", "A", mk(0)), (2, "u", "A", mk(5)),
         (3, "u", "B", mk(10)), (4, "v", "C", mk(0))],
        "event_id long, k string, state string, ts timestamp",
    )
    dim = scd2_build(chg, "k", "state", "ts", "event_id")
    facts = spark.createDataFrame(
        [(100, "u", mk(7)), (101, "u", mk(10)), (102, "u", mk(99)),
         (103, "v", mk(1)), (104, "w", mk(1))],
        "fid long, k string, ts timestamp",
    )
    got = {r["fid"]: r["state_asof"] for r in
           scd2_lookup(dim, facts, "k", "ts", "state").collect()}
    assert got[100] == "A"     # inside first validity range
    assert got[101] == "B"     # boundary: new version starts AT ts
    assert got[102] == "B"     # open current run
    assert got[103] == "C"
    assert got[104] is None    # unknown key


# ------------------------------------ calendar / KS / entropy
def test_calendar_table_attributes(spark):
    from job_post_similarity_spark.sources.io import calendar_table

    cal = calendar_table(spark, "2024-02-27", "2024-03-03").collect()
    assert len(cal) == 6  # leap day included
    by = {str(r["date"]): r for r in cal}
    assert by["2024-02-29"]["month"] == 2
    assert by["2024-02-29"]["iso_dow"] == 4      # a Thursday
    assert by["2024-03-02"]["is_weekend"] is True
    assert by["2024-03-02"]["year_month"] == "2024-03"
    assert by["2024-03-01"]["quarter"] == 1
    with pytest.raises(ValueError):
        calendar_table(spark, "2024-01-02", "2024-01-01")


def test_ks_statistic_identical_and_shifted(spark):
    from job_post_similarity_spark.operators.profiling import (
        ks_statistic,
    )

    rng = np.random.default_rng(17)
    a = [(float(x),) for x in rng.uniform(0, 100, 1000)]
    b = [(float(x),) for x in rng.uniform(50, 150, 1000)]
    mk = lambda v: spark.createDataFrame(v, "x double")
    same = ks_statistic(mk(a), mk(a), "x").collect()[0]
    assert same["ks_ppm"] == 0          # identical samples: D = 0
    shift = ks_statistic(mk(a), mk(b), "x").collect()[0]
    assert shift["ks_ppm"] > 400_000    # half-shifted uniforms: D~0.5
    assert shift["n_ref"] == shift["n_new"] == 1000

    # scipy-free exact reference on a tiny case
    ra, rb = [1.0, 2.0, 3.0], [2.5, 3.5]
    d = ks_statistic(
        mk([(x,) for x in ra]), mk([(x,) for x in rb]), "x"
    ).collect()[0]
    # max |F_a - F_b|: at x=2 F_a=2/3, F_b=0 -> D = 2/3
    assert d["ks_ppm"] == 1_000_000 * 4 // 6


def test_entropy_profile_bounds(spark):
    import math

    from job_post_similarity_spark.operators.profiling import (
        entropy_profile,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 1), ("c", 1)],
        "cat string, const int",
    )
    got = {r["column"]: r for r in
           entropy_profile(df, ["cat", "const"]).collect()}
    assert got["const"]["entropy_micro_nats"] == 0   # constant column
    assert got["const"]["n_values"] == 1
    # cat: p = [.5, .25, .25] -> H = 1.5 ln 2
    want = int(round(-0.5 * math.log(0.5) * 1e6)) + 2 * int(
        round(-0.25 * math.log(0.25) * 1e6)
    )
    assert got["cat"]["entropy_micro_nats"] == want


# ------------------------------------------ imputation & one-hot
def test_impute_group_mean_fallbacks(spark):
    from job_post_similarity_spark.operators.preprocess import (
        impute_group_mean,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", None),
         ("b", 10.0), ("c", None)],  # c: whole group null -> global
        "g string, v double",
    )
    out = {(r["g"], r["v"]): r["v_imputed"] for r in
           impute_group_mean(df, "v", "g").collect()}
    assert out[("a", None)] == 2.0          # group mean
    assert out[("a", 1.0)] == 1.0           # pass-through
    assert out[("c", None)] == round((1 + 3 + 10) / 3, 6)  # global
    allnull = spark.createDataFrame(
        [("a", None)], "g string, v double"
    )
    with pytest.raises(ValueError):
        impute_group_mean(allnull, "v", "g")


def test_one_hot_contract(spark):
    from job_post_similarity_spark.operators.preprocess import one_hot

    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "zzz"), (4, None)],
        "rid long, c string",
    )
    got = {r["rid"]: r["c_onehot"] for r in
           one_hot(df, "c", ["x", "y"]).collect()}
    assert got[1] == [1, 0] and got[2] == [0, 1]
    assert got[3] == [0, 0]   # unseen value: zeros, width stable
    assert got[4] == [0, 0]   # NULL: zeros


def test_stratified_semantic_dedup_relational_fallback(
    spark, monkeypatch
):
    """Past the broadcast budget the candidate verify falls back to
    the relational Arrow path — output must be identical."""
    from job_post_similarity_spark.operators import dedup, knn

    rng = np.random.default_rng(23)
    base = rng.normal(size=(40, 12))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(40)]
    rows += [(40 + j, base[j].tolist()) for j in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    want = {tuple(r) for r in dedup.stratified_semantic_dedup(
        df, k=4, threshold=0.999).collect()}

    def boom(*a, **k):
        raise ValueError("forced over-budget")

    monkeypatch.setattr(knn, "_collect_matrix", boom)
    got = {tuple(r) for r in dedup.stratified_semantic_dedup(
        df, k=4, threshold=0.999).collect()}
    assert got == want and got


# ----------------------------------------- k-fold & target encoding
def test_kfold_assign_properties(spark):
    from job_post_similarity_spark.operators.sampling import kfold_assign

    rows = [(i, f"g{i % 40}") for i in range(400)]
    df = spark.createDataFrame(rows, "rid long, fam string")
    out = kfold_assign(df, "rid", k=5).collect()
    assert all(0 <= r["fold"] < 5 for r in out)
    # roughly balanced row folds
    from collections import Counter
    c = Counter(r["fold"] for r in out)
    assert len(c) == 5 and min(c.values()) > 40
    # group mode: all members of a family share a fold
    g = kfold_assign(df, "fam", k=5, by_group=True).collect()
    fam_folds: dict = {}
    for r in g:
        fam_folds.setdefault(r["fam"], set()).add(r["fold"])
    assert all(len(s) == 1 for s in fam_folds.values())
    with pytest.raises(ValueError):
        kfold_assign(df, "rid", k=1)


def test_target_encode_loo_exact(spark):
    from job_post_similarity_spark.operators.preprocess import (
        target_encode_loo,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", 5.0),
         ("b", 10.0),            # singleton -> prior-dominated
         ("c", None),            # null target in a cat with no data
         ("a", None)],           # null target in a populated cat
        "cat string, y double",
    )
    w, gm = 10.0, (1 + 3 + 5 + 10) / 4
    got = {(r["cat"], r["y"]): r["cat_te"] for r in
           target_encode_loo(df, "cat", "y", prior_weight=w).collect()}
    # LOO: category sum excludes own target
    assert abs(got[("a", 1.0)] - ((9 - 1 + w * gm) / (3 - 1 + w))) < 1e-12
    assert abs(got[("a", 3.0)] - ((9 - 3 + w * gm) / (3 - 1 + w))) < 1e-12
    # singleton: (10-10 + w*gm)/(1-1+w) == gm exactly
    assert abs(got[("b", 10.0)] - gm) < 1e-12
    # null target rows: no subtraction
    assert abs(got[("a", None)] - ((9 + w * gm) / (3 + w))) < 1e-12
    assert abs(got[("c", None)] - ((0 + w * gm) / (0 + w))) < 1e-12


def test_bow_counts_vectorizer(spark):
    from job_post_similarity_spark.operators.text_analysis import (
        bow_counts,
    )

    df = spark.createDataFrame(
        [(0, "the cat the hat"), (1, "dog"), (2, None), (3, " THE ")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["bow"] for r in
           bow_counts(df, ["the", "cat", "zzz"]).collect()}
    assert got[0] == [2, 1, 0]   # counts, not presence
    assert got[1] == [0, 0, 0]   # all OOV
    assert got[2] == [0, 0, 0]   # null text -> zero vector
    assert got[3] == [1, 0, 0]   # lowercased + trimmed


def test_tree_rollup_descendant_totals(spark):
    from job_post_similarity_spark.operators.graph import tree_rollup

    # 1 -> {2, 3}; 2 -> {4}
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4)], "src long, dst long"
    )
    vals = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.5)], "id long, value double"
    )
    got = {r["node"]: (r["n_desc"], r["total_cents"]) for r in
           tree_rollup(edges, vals).collect()}
    assert got[1] == (3, 1050)   # 1+2+3+4.5 in cents
    assert got[2] == (1, 650)    # 2+4.5
    # leaves have no closure rows -> absent (documented: rollup is
    # over nodes WITH descendants)
    assert 3 not in got and 4 not in got
    # exclude self
    ns = {r["node"]: r["total_cents"] for r in
          tree_rollup(edges, vals, include_self=False).collect()}
    assert ns[1] == 950 and ns[2] == 450


# ----------------------------------------------- SSSP & Zipf slope
def test_shortest_paths_relaxation(spark):
    from job_post_similarity_spark.operators.graph import shortest_paths

    # diamond with a shortcut: 1->2 (1), 2->3 (1), 1->3 (5), 3->4 (1)
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (1, 3, 5), (3, 4, 1)],
        "src long, dst long, weight long",
    )
    got = {r["id"]: r["dist"] for r in
           shortest_paths(edges, source=1).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # via 2, not the 5-edge
    # bounded rounds: 1 round reaches only direct neighbors
    one = {r["id"]: r["dist"] for r in
           shortest_paths(edges, source=1, rounds=1).collect()}
    assert one == {1: 0, 2: 1, 3: 5}
    with pytest.raises(ValueError):
        shortest_paths(
            spark.createDataFrame([(1, 2, -1)],
                                  "src long, dst long, weight long"),
            source=1,
        )


def test_zipf_slope_on_planted_power_law(spark):
    from pyspark.sql.window import Window

    from job_post_similarity_spark.operators.profiling import linear_fit

    # frequencies c/r^0.8 -> slope of ln(freq) on ln(rank) = -0.8
    rows = [
        ("corpus",
         float(__import__("math").log(r)),
         float(__import__("math").log(1000.0 / r ** 0.8)))
        for r in range(1, 200)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = linear_fit(df, "g", "x", "y").collect()[0]
    assert abs(out["slope"] + 0.8) < 1e-6


def test_bpe_train_distributed_matches_driver_local(spark, documents):
    from job_post_similarity_spark.operators.text_analysis import (
        bpe_train,
        bpe_train_distributed,
    )

    dist = bpe_train_distributed(documents, num_merges=10).collect()
    assert [r["step"] for r in dist] == list(range(1, len(dist) + 1))
    assert all(r["pair_count"] >= 2 for r in dist)
    drv = bpe_train(documents, num_merges=10)
    assert [(r["sym_left"], r["sym_right"]) for r in dist] == drv


def test_bpe_train_distributed_self_overlap_run(spark):
    # 'aaaa' stresses the self-overlapping pair (a, a): leftmost-
    # greedy BPE groups [aa, aa</w>] — the double-separator replace
    # must match that, not the naive single-separator LTR grouping.
    from job_post_similarity_spark.operators.text_analysis import (
        bpe_train_distributed,
    )

    df = spark.createDataFrame(
        [("aaaa aaaa",), ("aaaa aaaa",)], "text string"
    )
    merges = bpe_train_distributed(df, num_merges=3).collect()
    got = [(r["sym_left"], r["sym_right"], r["pair_count"]) for r in merges]
    # vocab: aaaa ×4 → symbols a a a a</w>; pairs (a,a)=8, (a,a</w>)=4
    # merge1: (a,a) → [aa, aa</w>]... wait a</w> is distinct from a:
    # symbols a a a a</w>: (a,a)×2 + (a,a</w>)×1 per word → (a,a)=8
    # merge1 (a,a): leftmost-greedy on [a,a,a,a</w>] → [aa, a, a</w>]
    # merge2 pairs: (aa,a)=4, (a,a</w>)=4 → tie, (a,a</w>) < (aa,a)
    # lexicographically ('a' < 'aa'), so merge2 = (a, a</w>) →
    # [aa, aa</w>]; merge3 = (aa, aa</w>) count 4
    assert got == [
        ("a", "a", 8),
        ("a", "a</w>", 4),
        ("aa", "aa</w>", 4),
    ]


def test_ngram_precision_hand_example(spark):
    from job_post_similarity_spark.operators.metrics import (
        ngram_precision,
    )

    df = spark.createDataFrame(
        [
            # cand: clipped unigram matches: the×1 (ref has 1), cat×1
            # → 2/4; bigrams: "the cat" ×1 → 1/3
            (1, "the the cat sat", "the cat naps"),
            # zero overlap
            (2, "alpha beta", "gamma delta"),
        ],
        "pair_id int, cand_text string, ref_text string",
    )
    rows = {
        (r["pair_id"], r["n"]): (
            r["clipped_matches"],
            r["cand_total"],
            r["precision_ppm"],
        )
        for r in ngram_precision(df).collect()
    }
    assert rows[(1, 1)] == (2, 4, 500_000)
    assert rows[(1, 2)] == (1, 3, 333_333)
    assert rows[(2, 1)] == (0, 2, 0)
    assert rows[(2, 2)] == (0, 1, 0)


def test_rrf_fuse_hand_example(spark):
    from job_post_similarity_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(20, 1), (40, 2)], "doc_id long, rank long"
    )
    out = rrf_fuse({"a": a, "b": b}, k=60, top_n=10).collect()
    got = {r["doc_id"]: (r["n_lists"], r["score_micro"]) for r in out}
    m = 1_000_000
    assert got[20] == (2, m // 62 + m // 61)
    assert got[10] == (1, m // 61)
    assert got[40] == (1, m // 62)
    assert got[30] == (1, m // 63)
    # fused order: 20 first (two lists), ties broken by id
    assert out[0]["doc_id"] == 20


def test_token_budget_mixture_greedy_fill(spark, documents):
    from job_post_similarity_spark.operators.sampling import (
        _INC,
        _MOD,
        _MULT,
        token_budget_mixture,
    )

    budgets = {"src0": 300, "src1": 150}
    out = token_budget_mixture(documents, budgets).collect()
    kept = {r["doc_id"] for r in out}
    assert kept, "budgets should keep at least the first doc per source"
    # independent replay: per source, hash-order docs and greedy-fill
    rows = documents.selectExpr(
        "doc_id", "source",
        "size(split(trim(text), '\\\\s+')) AS n_tokens",
    ).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    expect = set()
    for src, rs in by_src.items():
        budget = budgets.get(src, 0)
        rs.sort(key=lambda r: ((r["doc_id"] % _MOD * _MULT + _INC) % _MOD,
                               r["doc_id"]))
        acc = 0
        for r in rs:
            if acc < budget:
                expect.add(r["doc_id"])
            acc += r["n_tokens"]
    assert kept == expect
    # unknown sources dropped under default_budget=0
    assert all(
        r["source"] in budgets
        for r in out
    )


def test_binary_quantize_hamming_matches_numpy(spark, embeddings):
    import numpy as np

    from job_post_similarity_spark.operators.knn import (
        binary_quantize,
        hamming_topk,
    )

    bits = binary_quantize(embeddings)
    got = [
        (r["vec_id"], r["hamming"])
        for r in hamming_topk(bits, query_id=0, k=5).collect()
    ]
    V = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float32)
        for r in embeddings.collect()
    }
    q = V[0] > 0
    expect = sorted(
        (int(((v > 0) != q).sum()), i) for i, v in V.items() if i != 0
    )[:5]
    assert got == [(i, h) for h, i in expect]


def test_binary_quantize_ragged_dim(spark):
    # 35 dims: one full 32-bit word + a 3-bit tail — the guarded
    # element_at must not touch indices past the vector end (ANSI
    # mode throws on out-of-bounds).
    from job_post_similarity_spark.operators.knn import binary_quantize

    vec = [1.0 if i % 3 == 0 else -1.0 for i in range(35)]
    df = spark.createDataFrame(
        [(1, vec)], "vec_id long, embedding array<float>"
    )
    (row,) = binary_quantize(df).collect()
    expect_w0 = sum(1 << j for j in range(32) if j % 3 == 0)
    expect_w1 = sum(1 << j for j in range(3) if (32 + j) % 3 == 0)
    assert row["bits"] == [expect_w0, expect_w1]


def test_matryoshka_truncate_renorm_and_clamp(spark):
    import math

    from job_post_similarity_spark.operators.knn import (
        matryoshka_truncate,
    )

    df = spark.createDataFrame(
        [(1, [3.0, 4.0, 1.0, 2.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: r["embedding_mrl"]
        for r in matryoshka_truncate(df, 2).collect()
    }
    # (3,4) renormalized -> (0.6, 0.8)
    assert [round(x, 6) for x in out[1]] == [0.6, 0.8]
    # shorter vector kept whole, renorm no-op on unit vector
    assert out[2] == [1.0, 0.0]
    for v in out.values():
        assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-9)


def test_hamming_rerank_matches_bruteforce_shortlist(spark, embeddings):
    import numpy as np

    from job_post_similarity_spark.operators.knn import (
        hamming_rerank_topk,
    )

    got = [
        (r["vec_id"], r["hamming"], r["similarity"])
        for r in hamming_rerank_topk(
            embeddings, query_id=0, shortlist=50, k=10
        ).collect()
    ]
    V = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in embeddings.collect()
    }
    qb = V[0] > 0
    ham = sorted(
        (int(((v > 0) != qb).sum()), i)
        for i, v in V.items()
        if i != 0
    )[:50]
    rer = sorted(
        (
            (-round(float(V[i] @ V[0]), 4), i, h)
            for h, i in ham
        )
    )[:10]
    expect = [(i, h, -s) for s, i, h in rer]
    assert got == expect


def test_keep_best_in_cluster_planted(spark):
    from job_post_similarity_spark.operators.dedup import (
        keep_best_in_cluster,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 0.5),
            (2, "a", 0.9),   # best in cluster a
            (3, "a", 0.9),   # same score, higher id -> loses tie
            (4, "b", 0.1),   # singleton
        ],
        "doc_id long, fp string, q double",
    )
    rows = {
        r["doc_id"]: (r["n_dups"], r["keep"])
        for r in keep_best_in_cluster(df, "fp", "q", "doc_id").collect()
    }
    assert rows[2] == (3, True)
    assert rows[3] == (3, False)
    assert rows[1] == (3, False)
    assert rows[4] == (1, True)


def test_fim_transform_properties(spark, documents):
    from job_post_similarity_spark.operators.curation import (
        fim_transform,
    )

    rows = fim_transform(documents).collect()
    for r in rows:
        assert (
            r["prefix_len"] + r["middle_len"] + r["suffix_len"]
            == r["n_tokens"]
        )
        if r["n_tokens"] >= 3:
            assert r["prefix_len"] >= 1
            assert r["middle_len"] >= 1
            assert r["suffix_len"] >= 1
        else:
            assert r["middle_len"] == 0 and r["suffix_len"] == 0
        assert r["fim_text"].startswith("<PRE>")
        assert "<SUF>" in r["fim_text"] and "<MID>" in r["fim_text"]
    # deterministic across invocations
    again = fim_transform(documents).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_fim_transform_short_doc_passthrough(spark):
    from job_post_similarity_spark.operators.curation import (
        fim_transform,
    )

    df = spark.createDataFrame(
        [(1, "only two"), (2, "one"), (3, "a b c")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in fim_transform(df).collect()}
    assert rows[1]["fim_text"] == "<PRE>only two<SUF><MID>"
    assert rows[2]["fim_text"] == "<PRE>one<SUF><MID>"
    r3 = rows[3]
    assert r3["prefix_len"] == 1 and r3["middle_len"] == 1
    assert r3["fim_text"] == "<PRE>a<SUF>c<MID>b"


def test_bpe_encode_expr_matches_pandas_udf_tier(spark, documents):
    from job_post_similarity_spark.operators.text_analysis import (
        bpe_apply,
        bpe_encode_expr,
        bpe_train,
    )

    merges = bpe_train(documents, num_merges=8)
    a = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_encode_expr(documents, merges).collect()
    }
    b = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_apply(documents, merges).collect()
    }
    assert a == b


def test_bpe_encode_expr_rejects_unsafe_merge_symbols(spark, documents):
    import pytest as _pytest

    from job_post_similarity_spark.operators.text_analysis import (
        bpe_encode_expr,
    )

    with _pytest.raises(ValueError):
        bpe_encode_expr(documents, [("a'b", "c")])


def test_kcenter_select_greedy_matches_numpy(spark, embeddings):
    import numpy as np

    from job_post_similarity_spark.operators.knn import kcenter_select

    got = [
        (r["sel_rank"], r["vec_id"], r["dist"])
        for r in kcenter_select(embeddings, k=5).collect()
    ]
    V = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in embeddings.collect()
    }
    ids = sorted(V)
    chosen = [ids[0]]
    dist = {
        i: round(1.0 - float(V[i] @ V[ids[0]]), 4)
        for i in ids
        if i != ids[0]
    }
    expect = [(1, ids[0], 0.0)]
    for rank in range(2, 6):
        far = max(((d, -i) for i, d in dist.items()))
        pick = -far[1]
        expect.append((rank, pick, dist[pick]))
        del dist[pick]
        for i in dist:
            dist[i] = min(
                dist[i], round(1.0 - float(V[i] @ V[pick]), 4)
            )
        chosen.append(pick)
    assert got == sorted(expect)


def test_minhash_oracle_tier_verify_is_exact_jaccard(spark, documents):
    """Every emitted pair's ppm Jaccard must equal an independent
    Python recount over the same 3-gram shingle sets, and clear the
    threshold; candidate generation must require a full band match."""
    from job_post_similarity_spark.operators.dedup import (
        minhash_near_dup_pairs_oracle_tier,
    )

    sub = documents.filter("doc_id < 100")
    out = minhash_near_dup_pairs_oracle_tier(
        sub, threshold_ppm=300_000
    ).collect()
    texts = {r["doc_id"]: r["text"] for r in sub.collect()}

    def shingles(t):
        toks = t.strip().split()
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    assert out, "corpus has planted near-dups below doc_id 100"
    for r in out:
        g1, g2 = shingles(texts[r["id1"]]), shingles(texts[r["id2"]])
        inter = len(g1 & g2)
        expect = 1_000_000 * inter // (len(g1) + len(g2) - inter)
        assert r["jaccard_ppm"] == expect
        assert r["jaccard_ppm"] >= 300_000


def test_minhash_oracle_tier_short_docs_excluded(spark):
    """Docs with < 3 tokens have no shingles: they must not band
    together on the init signature (the zero-divide guard)."""
    from job_post_similarity_spark.operators.dedup import (
        minhash_near_dup_pairs_oracle_tier,
    )

    df = spark.createDataFrame(
        [(1, "too short"), (2, "also tiny"), (3, "x y")],
        "doc_id long, text string",
    )
    assert minhash_near_dup_pairs_oracle_tier(df).collect() == []


def test_simhash_oracle_tier_blocking_complete(spark, documents):
    """The chunk-blocked result must equal a quadratic numpy replay:
    pigeonhole blocking may not lose any pair within distance 3."""
    from job_post_similarity_spark.operators.dedup import (
        simhash_near_dup_pairs_oracle_tier,
    )

    sub = documents.filter("doc_id < 200")
    got = [
        (r["id1"], r["id2"], r["hamming"])
        for r in simhash_near_dup_pairs_oracle_tier(sub).collect()
    ]
    import hashlib

    sigs = {}
    for r in sub.collect():
        toks = r["text"].strip().lower().split()
        votes = [0] * 56
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:14], 16)
            for b in range(56):
                votes[b] += 1 if (h >> b) & 1 else -1
        sigs[r["doc_id"]] = sum(
            1 << b for b in range(56) if votes[b] > 0
        )
    ids = sorted(sigs)
    expect = [
        (i, j, bin(sigs[i] ^ sigs[j]).count("1"))
        for i in ids
        for j in ids
        if i < j and bin(sigs[i] ^ sigs[j]).count("1") <= 3
    ]
    assert got == expect


def test_simhash_oracle_tier_rejects_unprovable_distance(spark, documents):
    import pytest as _pytest

    from job_post_similarity_spark.operators.dedup import (
        simhash_near_dup_pairs_oracle_tier,
    )

    with _pytest.raises(ValueError):
        simhash_near_dup_pairs_oracle_tier(documents, max_dist=4)


def test_srp_rademacher_tier_matches_numpy(spark, embeddings):
    """Bucket assignment and surviving pairs must equal an integer
    numpy replay with the same sign matrix."""
    import numpy as np

    from job_post_similarity_spark.operators.ann import (
        rademacher_signs,
        srp_rademacher_pairs_oracle_tier,
    )

    signs = rademacher_signs(32, 64)
    got = [
        (r["id1"], r["id2"], r["similarity"])
        for r in srp_rademacher_pairs_oracle_tier(
            embeddings, signs, threshold=0.4
        ).collect()
    ]
    S = np.array(signs, dtype=np.int64)
    rows = embeddings.collect()
    Vd = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in rows
    }
    Q = {
        i: np.array(
            [
                int(np.floor(abs(x) * 1e6 + 0.5)) * (1 if x >= 0 else -1)
                for x in v
            ],
            dtype=np.int64,
        )
        for i, v in Vd.items()
    }
    buckets: dict = {}
    for i, q in Q.items():
        dots = S @ q
        bits = dots > 0
        for b in range(4):
            key = (
                b,
                int(
                    sum(
                        1 << j
                        for j in range(8)
                        if bits[b * 8 + j]
                    )
                ),
            )
            buckets.setdefault(key, []).append(i)
    cand = set()
    for ids in buckets.values():
        ids.sort()
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                cand.add((ids[a], ids[b]))
    expect = sorted(
        (i, j, round(float(Vd[i] @ Vd[j]), 4))
        for i, j in cand
        if round(float(Vd[i] @ Vd[j]), 4) >= 0.4
    )
    assert got == expect


def test_ivf_stratified_search_probes_and_prunes(spark, embeddings):
    """The probed result must equal a numpy replay restricted to the
    2 nearest strata, and pruned clusters must be absent."""
    import numpy as np

    from job_post_similarity_spark.operators.ann import (
        ivf_stratified_topk_search,
    )

    got = [
        (r["vec_id"], r["cluster"], r["similarity"])
        for r in ivf_stratified_topk_search(
            embeddings, 0, k_clusters=8, n_probe=2, topk=10
        ).collect()
    ]
    rows = embeddings.collect()
    Vd = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in rows
    }
    # DECIMAL-exact stratum means at 6dp == plain mean rounded here
    strata: dict = {}
    for i, v in Vd.items():
        strata.setdefault(i % 8, []).append(v)
    cents = {
        lab: np.round(np.mean(np.stack(vs), axis=0), 6)
        for lab, vs in strata.items()
    }
    q = Vd[0]
    probes = sorted(
        ((-float(q @ c), lab) for lab, c in cents.items())
    )[:2]
    probed = {lab for _s, lab in probes}
    assign = {
        i: max(
            ((float(v @ cents[lab]), -lab) for lab in sorted(cents))
        )
        for i, v in Vd.items()
    }
    cluster = {
        i: -t[1] for i, t in assign.items()
    }
    cand = [
        (i, cluster[i], round(float(Vd[i] @ q), 4))
        for i in Vd
        if i != 0 and cluster[i] in probed
    ]
    expect = sorted(cand, key=lambda t: (-t[2], t[0]))[:10]
    assert got == expect
    assert all(c in probed for _i, c, _s in got)


def test_pq_stratified_adc_matches_numpy(spark, embeddings):
    """Codes and ADC ranking must equal a numpy replay with the same
    stratified sub-codebooks and LTR score accumulation."""
    import numpy as np

    from job_post_similarity_spark.operators.ann import (
        pq_stratified_adc_search,
    )

    got = [
        (r["vec_id"], r["score_adc"])
        for r in pq_stratified_adc_search(
            embeddings, 0, m=8, k_codes=8, topk=10
        ).collect()
    ]
    rows = embeddings.collect()
    Vd = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in rows
    }
    dim = len(next(iter(Vd.values())))
    sub = dim // 8
    strata: dict = {}
    for i, v in Vd.items():
        strata.setdefault(i % 8, []).append(v)
    books = {}
    for j in range(8):
        books[j] = {
            lab: np.round(
                np.mean(np.stack(vs), axis=0)[j * sub : (j + 1) * sub],
                6,
            )
            for lab, vs in strata.items()
        }
    q = Vd[0]
    table = {
        j: {
            lab: float(q[j * sub : (j + 1) * sub] @ cv)
            for lab, cv in books[j].items()
        }
        for j in range(8)
    }
    scores = {}
    for i, v in Vd.items():
        if i == 0:
            continue
        s = 0.0
        for j in range(8):
            svec = v[j * sub : (j + 1) * sub]
            best = max(
                (float(svec @ books[j][lab]), -lab)
                for lab in books[j]
            )
            s += table[j][-best[1]]
        scores[i] = round(s, 4)
    expect = sorted(
        scores.items(), key=lambda kv: (-kv[1], kv[0])
    )[:10]
    assert got == [(i, s) for i, s in expect]


def test_ivfpq_stratified_matches_numpy(spark, embeddings):
    """Coarse assignment, residual codes, per-probe tables, and the
    final ADC ranking must equal a numpy replay (HALF_UP rounding)."""
    import numpy as np

    from job_post_similarity_spark.operators.ann import (
        ivfpq_stratified_search,
    )

    got = [
        (r["vec_id"], r["cluster"], r["score_adc"])
        for r in ivfpq_stratified_search(
            embeddings, 0, k_coarse=8, m=8, k_codes=8, n_probe=2,
            topk=10,
        ).collect()
    ]

    def r6(x):
        return np.floor(np.abs(x) * 1e6 + 0.5) / 1e6 * np.sign(x)

    rows = embeddings.collect()
    Vd = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in rows
    }
    dim = len(next(iter(Vd.values())))
    sub = dim // 8
    strata: dict = {}
    for i, v in Vd.items():
        strata.setdefault(i % 8, []).append(v)
    coarse = {
        lab: np.round(np.mean(np.stack(vs), axis=0), 6)
        for lab, vs in strata.items()
    }
    cluster = {
        i: -max(
            ((float(v @ coarse[lab]), -lab) for lab in sorted(coarse))
        )[1]
        for i, v in Vd.items()
    }
    res = {i: r6(Vd[i] - coarse[cluster[i]]) for i in Vd}
    st2: dict = {}
    for i in Vd:
        st2.setdefault((i // 8) % 8, []).append(res[i])
    books = {
        j: {
            lab: np.round(
                np.mean(np.stack(rs), axis=0)[j * sub : (j + 1) * sub],
                6,
            )
            for lab, rs in st2.items()
        }
        for j in range(8)
    }
    q = Vd[0]
    probes = [
        t[1]
        for t in sorted(
            ((-float(q @ c), lab) for lab, c in coarse.items())
        )[:2]
    ]
    tables = {}
    for pl in probes:
        qr = r6(q - coarse[pl])
        tables[pl] = {
            j: {
                lab: float(
                    qr[j * sub : (j + 1) * sub] @ books[j][lab]
                )
                for lab in books[j]
            }
            for j in range(8)
        }
    scores = {}
    for i in Vd:
        if i == 0 or cluster[i] not in probes:
            continue
        s = 0.0
        for j in range(8):
            sv = res[i][j * sub : (j + 1) * sub]
            code = -max(
                ((float(sv @ books[j][lab]), -lab) for lab in books[j])
            )[1]
            s += tables[cluster[i]][j][code]
        scores[i] = (cluster[i], round(s, 4))
    expect = sorted(
        ((i, c, s) for i, (c, s) in scores.items()),
        key=lambda t: (-t[2], t[0]),
    )[:10]
    assert got == expect


def test_mmr_oracle_tier_diversifies_and_replays(spark, embeddings):
    """Pick sequence must equal an independent replay, and the tier
    must actually diversify vs pure relevance ordering when the pool
    contains near-duplicates (planted twin of the top hit)."""
    from pyspark.sql import functions as F

    from job_post_similarity_spark.operators.knn import (
        mmr_rerank_oracle_tier,
    )

    twin = (
        embeddings.filter(F.col("vec_id") == 1)
        .select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            "embedding",
            "label",
        )
    )
    df = embeddings.unionByName(twin)
    out = mmr_rerank_oracle_tier(df, 0, pool=20, k=5).collect()
    ranks = {r["vec_id"]: r["mmr_rank"] for r in out}
    # the planted twin of vec 1 duplicates it exactly: if vec 1 is
    # picked, 100001's maxsim is ~1e4 so it must NOT be picked next
    if 1 in ranks and 100001 in ranks:
        assert abs(ranks[1] - ranks[100001]) > 1
    for r in out:
        assert r["mmr_score_e5"] == int(r["mmr_score_e5"])
    assert [r["mmr_rank"] for r in out] == [1, 2, 3, 4, 5]


# ---------------------------------------------------------------------------
# Gopher repetition signals (round 6)
# ---------------------------------------------------------------------------


def test_duplicate_line_stats_hand_case(spark):
    from job_post_similarity_spark.operators.text_analysis import (
        duplicate_line_stats,
    )

    df = spark.createDataFrame(
        [(1, "a\nb\na\na"), (2, "x\ny"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in duplicate_line_stats(df).collect()}
    r1 = rows[1]
    assert (r1["n_lines"], r1["n_dup_lines"]) == (4, 2)
    assert r1["dup_line_ppm"] == 500_000
    assert (r1["n_line_chars"], r1["n_dup_line_chars"]) == (4, 2)
    assert r1["dup_line_char_ppm"] == 500_000
    r2 = rows[2]
    assert (r2["n_dup_lines"], r2["dup_line_ppm"]) == (0, 0)
    # empty text = one empty line, zero chars
    r3 = rows[3]
    assert (r3["n_lines"], r3["dup_line_char_ppm"]) == (1, 0)


def test_top_ngram_char_fraction_hand_case(spark):
    from job_post_similarity_spark.operators.text_analysis import (
        top_ngram_char_fraction,
    )

    df = spark.createDataFrame(
        [(1, "x y x y z"), (2, "solo")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r for r in top_ngram_char_fraction(df, n=2).collect()
    }
    r1 = rows[1]
    assert (r1["top_gram"], r1["top_cnt"]) == ("x y", 2)
    assert r1["total_chars"] == 9
    assert r1["top_ngram_char_ppm"] == 2 * 3 * 1_000_000 // 9
    # < n tokens: empty gram, ppm 0
    r2 = rows[2]
    assert (r2["top_gram"], r2["top_cnt"], r2["top_ngram_char_ppm"]) == (
        "",
        0,
        0,
    )


def test_duplicate_ngram_char_coverage_overlap_union(spark):
    """Overlapping duplicate-gram occurrences must count each char
    once: 'a b a b a' has every 2-gram duplicated and their intervals
    tile the whole canonical text -> ppm exactly 1e6; the disjoint
    case covers 9 of 17 chars."""
    from job_post_similarity_spark.operators.text_analysis import (
        duplicate_ngram_char_coverage,
    )

    df = spark.createDataFrame(
        [
            (1, "a b a b a"),
            (2, "p q z r p q w p q"),
            (3, "all distinct tokens here now"),
            (4, "tiny"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in duplicate_ngram_char_coverage(df, n=2).collect()
    }
    assert rows[1]["covered_chars"] == 9
    assert rows[1]["total_chars"] == 9
    assert rows[1]["dup_ngram_char_ppm"] == 1_000_000
    assert rows[2]["covered_chars"] == 9
    assert rows[2]["total_chars"] == 17
    assert rows[2]["dup_ngram_char_ppm"] == 9 * 1_000_000 // 17
    assert rows[3]["covered_chars"] == 0
    assert rows[3]["dup_ngram_char_ppm"] == 0
    # shorter than n tokens: emitted with 0 coverage
    assert rows[4]["covered_chars"] == 0


def test_unigram_lm_train_hand_case(spark):
    """One EM round on a corpus small enough to verify by hand:
    'ab' out-scores 'a'+'b' (one piece at ln .3 beats two), so after
    the E-step the multi piece absorbs all 'ab' usage and the unused
    singles survive only through add-one smoothing."""
    from job_post_similarity_spark.operators.text_analysis import (
        unigram_lm_train,
    )

    df = spark.createDataFrame(
        [(1, "ab ab ab c")], "doc_id long, text string"
    )
    out = unigram_lm_train(
        df, vocab_size=10, iters=1, max_piece_len=2
    ).collect()
    got = {r["piece"]: r["freq"] for r in out}
    assert got == {"a": 1, "b": 1, "c": 2, "ab": 3}
    # lp6 = round(ln(freq/7) * 1e6) over the pruned set
    import math

    for r in out:
        assert r["lp6"] == round(math.log(r["freq"] / 7) * 1e6)


def test_unigram_driver_tier_equals_distributed(spark):
    """The bounded-probe driver fast tier (word table collected once,
    EM/loss passes in-process) must be row-for-row equal to the
    distributed mapInPandas path — both run the same _viterbi_split
    over the same integer counts, so forcing the budget to 0 (every
    table 'too big') must not change a single piece, freq, or lp6,
    on both prune criteria."""
    from job_post_similarity_spark.operators import text_analysis as TA

    df = spark.createDataFrame(
        [
            (1, "ab ab ab c abc"),
            (2, "abc abc ab a b"),
            (3, "cab cab ab abc ca"),
        ],
        "doc_id long, text string",
    )
    assert TA._UNIGRAM_DRIVER_BUDGET > 0  # default: fast tier on
    for prune, shrink in (("freq", None), ("loss", None), ("loss", 0.6)):
        fast = TA.unigram_lm_train(
            df, vocab_size=8, iters=2, max_piece_len=3,
            prune=prune, shrink_factor=shrink,
        ).collect()
        old = TA._UNIGRAM_DRIVER_BUDGET
        TA._UNIGRAM_DRIVER_BUDGET = 0
        try:
            dist = TA.unigram_lm_train(
                df, vocab_size=8, iters=2, max_piece_len=3,
                prune=prune, shrink_factor=shrink,
            ).collect()
        finally:
            TA._UNIGRAM_DRIVER_BUDGET = old
        assert fast == dist, (prune, shrink)


def test_unigram_viterbi_matches_brute_force():
    """The DP segmentation score equals the max over ALL
    segmentations, and ties resolve to the shortest-last-piece path
    (the rule the SQL replay mirrors)."""
    import itertools

    from job_post_similarity_spark.operators.text_analysis import (
        _viterbi_split,
    )

    scores = {
        "a": -5_000_000, "b": -4_000_000, "c": -6_000_000,
        "ab": -7_000_000, "bc": -9_000_000, "abc": -13_000_000,
        "ca": -8_000_000,
    }

    def brute(word):
        best = None
        n = len(word)
        for cuts in itertools.product([0, 1], repeat=n - 1):
            pos = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
            segs = [word[pos[i]:pos[i + 1]] for i in range(len(pos) - 1)]
            if any(s not in scores for s in segs):
                continue
            sc = sum(scores[s] for s in segs)
            if best is None or sc > best:
                best = sc
        return best

    for word in ["abc", "abca", "cab", "bcab", "aabbcc", "abcabc"]:
        segs = _viterbi_split(word, scores, 3)
        want = brute(word)
        if want is None:
            assert segs is None
        else:
            assert segs is not None
            assert "".join(segs) == word
            assert sum(scores[p] for p in segs) == want

    # unsegmentable word (char outside vocabulary)
    assert _viterbi_split("abz", scores, 3) is None
    # explicit tie: s(xy) == s(x)+s(y) -> shortest last piece wins
    tie = {"x": -1_000_000, "y": -1_000_000, "xy": -2_000_000}
    assert _viterbi_split("xy", tie, 2) == ["x", "y"]


def test_unigram_encode_counts_and_scores(spark):
    from job_post_similarity_spark.operators.text_analysis import (
        unigram_lm_train,
        unigram_viterbi_encode,
    )

    df = spark.createDataFrame(
        [(1, "ab ab c"), (2, "c c"), (3, "")],
        "doc_id long, text string",
    )
    pieces = unigram_lm_train(df, vocab_size=10, iters=1, max_piece_len=2)
    rows = pieces.collect()
    lp = {r["piece"]: r["lp6"] for r in rows}
    enc = {
        r["doc_id"]: (r["n_pieces"], r["score6"])
        for r in unigram_viterbi_encode(df, rows).collect()
    }
    # 'ab' is a trained piece -> 1 piece per 'ab' word
    assert enc[1] == (3, 2 * lp["ab"] + lp["c"])
    assert enc[2] == (2, 2 * lp["c"])
    assert enc[3] == (0, 0)


def test_unigram_lm_second_em_round_converges(spark):
    """On the hand-case corpus the segmentation choices are stable
    after round 1, so round 2 only re-weights: piece SET unchanged,
    usage re-counted under the new scores, and a third round is a
    fixed point of the piece set."""
    from job_post_similarity_spark.operators.text_analysis import (
        unigram_lm_train,
    )

    df = spark.createDataFrame(
        [(1, "ab ab ab c ab c")], "doc_id long, text string"
    )
    p1 = {
        r["piece"]: r["freq"]
        for r in unigram_lm_train(
            df, vocab_size=10, iters=1, max_piece_len=2
        ).collect()
    }
    p2 = {
        r["piece"]: r["freq"]
        for r in unigram_lm_train(
            df, vocab_size=10, iters=2, max_piece_len=2
        ).collect()
    }
    p3 = {
        r["piece"]: r["freq"]
        for r in unigram_lm_train(
            df, vocab_size=10, iters=3, max_piece_len=2
        ).collect()
    }
    assert set(p1) == set(p2) == set(p3)
    # 'ab' keeps winning its words; singles stay smoothed at 1
    assert p2["ab"] == 4 and p2["c"] == 3
    assert p2 == p3  # fixed point


def test_unigram_loss_prune_matches_local_reference(spark):
    """prune='loss' (the SentencePiece-faithful cut, Kudo 2018 §3.2):
    the kept multi-char set equals a pure-Python replay of the
    criterion — per piece, Σ cnt·(best6 − alt6) over words whose best
    path uses it, alt6 the what-if DP with the piece banned — ranked
    (loss DESC, freq DESC, piece ASC). Also pins that the criterion
    BITES: on this corpus the frequent-but-substitutable piece is
    pruned while the freq tier keeps it."""
    from job_post_similarity_spark.operators.text_analysis import (
        _unigram_word_table,
        _viterbi_score,
        _viterbi_split,
        unigram_lm_train,
    )

    rows = [
        ("the them they then there this that " * 6,),
        ("qz qzqz wqz " * 4,),
        ("aaa bbb ab ba " * 5,),
    ]
    docs = spark.createDataFrame(rows, "text string")
    knobs = dict(
        vocab_size=20, iters=1, max_piece_len=3, seed_pool=30
    )
    freq_v = unigram_lm_train(docs, "text", prune="freq", **knobs)
    loss_v = unigram_lm_train(docs, "text", prune="loss", **knobs)
    freq_multi = {
        r["piece"] for r in freq_v.collect() if len(r["piece"]) > 1
    }
    loss_multi = {
        r["piece"]: r["freq"]
        for r in loss_v.collect()
        if len(r["piece"]) > 1
    }
    assert freq_multi != set(loss_multi), (
        "fixture no longer separates the two prune criteria"
    )

    # local reference: replay seed -> 1 EM round -> loss rank
    import math

    wc = {
        r["w"]: r["cnt"]
        for r in _unigram_word_table(docs, "text").collect()
    }
    seed: dict = {}
    for w, cnt in wc.items():
        for ln in range(1, 4):
            for i in range(len(w) - ln + 1):
                seed[w[i : i + ln]] = seed.get(w[i : i + ln], 0) + cnt
    singles = {p: f for p, f in seed.items() if len(p) == 1}
    multi = sorted(
        ((p, f) for p, f in seed.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:30]
    pool = dict(singles, **dict(multi))
    tot = sum(pool.values())
    lp = {p: round(math.log(f / tot) * 1e6) for p, f in pool.items()}
    use: dict = {}
    for w, cnt in wc.items():
        for p in _viterbi_split(w, lp, 3) or []:
            use[p] = use.get(p, 0) + cnt
    post = {
        p: use.get(p, 0) + (1 if len(p) == 1 else 0) for p in pool
    }
    post = {p: f for p, f in post.items() if f > 0}
    tot2 = sum(post.values())
    lp2 = {p: round(math.log(f / tot2) * 1e6) for p, f in post.items()}
    loss: dict = {}
    for w, cnt in wc.items():
        segs = _viterbi_split(w, lp2, 3)
        if segs is None:
            continue
        best6 = sum(lp2[p] for p in segs)
        for p in set(segs):
            if len(p) > 1:
                alt6 = _viterbi_score(w, lp2, 3, banned=p)
                loss[p] = loss.get(p, 0) + cnt * (best6 - alt6)
    n_singles = sum(1 for p in post if len(p) == 1)
    want = sorted(
        ((p, f) for p, f in post.items() if len(p) > 1),
        key=lambda t: (-loss.get(t[0], 0), -t[1], t[0]),
    )[: 20 - n_singles]
    assert loss_multi == dict(want)


def test_unigram_encode_parity_across_prune_tiers(spark):
    """The ENCODER is prune-agnostic: under either tier's vocabulary,
    unigram_viterbi_encode's per-doc (n_pieces, score6) equals a local
    Viterbi replay under that vocabulary's scores — swapping the prune
    criterion changes the model, never the serving semantics. Both
    vocabularies keep every word segmentable (single-char coverage)."""
    from job_post_similarity_spark.operators.text_analysis import (
        _viterbi_split,
        unigram_lm_train,
        unigram_viterbi_encode,
    )

    rows = [
        (1, "the them they then there this that " * 3),
        (2, "qz qzqz wqz aaa bbb ab ba"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    knobs = dict(
        vocab_size=20, iters=1, max_piece_len=3, seed_pool=30
    )
    for prune in ("freq", "loss"):
        vocab = unigram_lm_train(docs, "text", prune=prune, **knobs)
        lp = {r["piece"]: r["lp6"] for r in vocab.collect()}
        got = {
            r["doc_id"]: (r["n_pieces"], r["score6"])
            for r in unigram_viterbi_encode(
                docs, vocab, id_col="doc_id", max_piece_len=3
            ).collect()
        }
        for doc_id, text in rows:
            n, s = 0, 0
            for w in text.strip().lower().split():
                segs = _viterbi_split(w, lp, 3)
                assert segs is not None, (prune, w)
                n += len(segs)
                s += sum(lp[p] for p in segs)
            assert got[doc_id] == (n, s), (prune, doc_id)


def test_unigram_prune_arg_validation(spark):
    import pytest as _pytest

    from job_post_similarity_spark.operators.text_analysis import (
        unigram_lm_train,
    )

    df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        unigram_lm_train(df, vocab_size=4, prune="entropy")
    with _pytest.raises(ValueError):
        unigram_lm_train(df, vocab_size=4, shrink_factor=0.75)
    with _pytest.raises(ValueError):
        unigram_lm_train(
            df, vocab_size=4, prune="loss", shrink_factor=1.5
        )


def test_unigram_shrink_cycles_match_local_reference(spark):
    """shrink_factor runs SentencePiece's actual loop — prune BETWEEN
    EM rounds: after each round's M-step, keep the top shrink_factor
    fraction of the multi pool by likelihood loss (never below the
    final target), re-EM over the shrunk pool; the last round cuts to
    vocab_size. Pinned against a pure-Python replay of seed → (EM →
    loss-shrink) × 2, and shown to differ from the one-shot loss
    prune on the same corpus (the intermediate re-EM is what one-shot
    pruning misses)."""
    import math

    from job_post_similarity_spark.operators.text_analysis import (
        _unigram_word_table,
        _viterbi_score,
        _viterbi_split,
        unigram_lm_train,
    )

    rows = [
        ("the them they then there this that " * 6,),
        ("qz qzqz wqz " * 4,),
        ("aaa bbb ab ba " * 5,),
    ]
    docs = spark.createDataFrame(rows, "text string")
    knobs = dict(
        vocab_size=20, iters=2, max_piece_len=3, seed_pool=30
    )
    got = {
        (r["piece"], r["freq"], r["lp6"])
        for r in unigram_lm_train(
            docs, "text", prune="loss", shrink_factor=0.75, **knobs
        ).collect()
    }

    # ---- pure-Python replay -------------------------------------
    wc = {
        r["w"]: r["cnt"]
        for r in _unigram_word_table(docs, "text").collect()
    }

    def lp6_of(pool: dict) -> dict:
        tot = sum(pool.values())
        return {
            p: round(math.log(f / tot) * 1e6) for p, f in pool.items()
        }

    def em_step(pool: dict) -> dict:
        lp = lp6_of(pool)
        use: dict = {}
        for w, cnt in wc.items():
            for p in _viterbi_split(w, lp, 3) or []:
                use[p] = use.get(p, 0) + cnt
        post = {
            p: use.get(p, 0) + (1 if len(p) == 1 else 0) for p in pool
        }
        return {p: f for p, f in post.items() if f > 0}

    def loss_of(pool: dict) -> dict:
        lp = lp6_of(pool)
        loss: dict = {}
        for w, cnt in wc.items():
            segs = _viterbi_split(w, lp, 3)
            if segs is None:
                continue
            best6 = sum(lp[p] for p in segs)
            for p in set(segs):
                if len(p) > 1:
                    alt6 = _viterbi_score(w, lp, 3, banned=p)
                    loss[p] = loss.get(p, 0) + cnt * (best6 - alt6)
        return loss

    seed: dict = {}
    for w, cnt in wc.items():
        for ln in range(1, 4):
            for i in range(len(w) - ln + 1):
                seed[w[i : i + ln]] = seed.get(w[i : i + ln], 0) + cnt
    singles = {p: f for p, f in seed.items() if len(p) == 1}
    multi = sorted(
        ((p, f) for p, f in seed.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:30]
    pool = dict(singles, **dict(multi))
    for rnd in range(2):
        pool = em_step(pool)
        loss = loss_of(pool)
        n_singles = sum(1 for p in pool if len(p) == 1)
        target = max(0, 20 - n_singles)
        ranked = sorted(
            ((p, f) for p, f in pool.items() if len(p) > 1),
            key=lambda t: (-loss.get(t[0], 0), -t[1], t[0]),
        )
        keep = (
            target
            if rnd == 1
            else max(target, math.ceil(len(ranked) * 0.75))
        )
        pool = dict(
            {p: f for p, f in pool.items() if len(p) == 1},
            **dict(ranked[:keep]),
        )
    lp = lp6_of(pool)
    want = {(p, f, lp[p]) for p, f in pool.items()}
    assert got == want

    # the trajectory matters: shrink-cycles pick a different vocab
    # than the one-shot loss prune on this corpus
    oneshot = {
        r["piece"]
        for r in unigram_lm_train(
            docs, "text", prune="loss", **knobs
        ).collect()
    }
    assert {p for p, _, _ in got} != oneshot


def test_ngram_lm_train_matches_local_reference(spark):
    """The trigram Stupid Backoff trainer's ARPA-analog relation
    (order, gram, cnt, conditional micro-log) equals a pure-Python
    replay of the spec: BOS/BOS/…/EOS padded lowercase whitespace
    streams, order-1/2/3 counts over all padded positions, lp6 =
    round(ln(cnt/ctx)·1e6), order-0 row = (N, ln(1/N))."""
    import math
    from collections import Counter

    from job_post_similarity_spark.operators.text_analysis import (
        ngram_lm_train,
    )

    rows = [
        "The cat sat on the mat",
        "the dog  sat on the log",
        "a cat and a dog",
        "",  # dropped: blank
        None,  # dropped: null
    ]
    df = spark.createDataFrame([(t,) for t in rows], "text string")
    got = {
        (r["order"], r["w1"], r["w2"], r["w3"]): (r["cnt"], r["lp6"])
        for r in ngram_lm_train(df).collect()
    }

    c = {1: Counter(), 2: Counter(), 3: Counter()}
    for t in rows:
        if not t or not t.strip():
            continue
        s = ["<s>", "<s>"] + t.lower().strip().split() + ["</s>"]
        for o in (1, 2, 3):
            for i in range(len(s) - o + 1):
                c[o][tuple(s[i : i + o])] += 1
    n_tot = sum(c[1].values())

    def lp6(num, den):
        return round(math.log(num / den) * 1e6)

    exp = {}
    for g, v in c[3].items():
        exp[(3,) + g] = (v, lp6(v, c[2][g[:2]]))
    for g, v in c[2].items():
        exp[(2,) + g + (None,)] = (v, lp6(v, c[1][g[:1]]))
    for g, v in c[1].items():
        exp[(1,) + g + (None, None)] = (v, lp6(v, n_tot))
    exp[(0, None, None, None)] = (n_tot, lp6(1, n_tot))
    assert got == exp


def test_ngram_lm_score_exercises_every_backoff_branch(spark):
    """Cross-corpus scoring replays the full Stupid Backoff chain:
    a doc with seen trigrams (direct conditional), one forcing the
    bigram backoff (-916291 + lp6), one forcing the unigram backoff
    (2·alpha6 + lp6), and one fully OOV (2·alpha6 + ln(1/N) floor) —
    each equal to the hand replay, with n_events = tokens + 1."""
    import math
    from collections import Counter

    from job_post_similarity_spark.operators.text_analysis import (
        _SB_ALPHA6,
        ngram_lm_score,
        ngram_lm_train,
    )

    train_rows = ["the cat sat on the mat", "the dog sat on the log"]
    score_rows = [
        (1, "the cat sat on the mat"),  # all trigrams seen
        (2, "the dog sat on the mat"),  # bigram/unigram backoffs
        (3, "mat the cat"),  # unseen bigrams, seen unigrams
        (4, "zzz qqq"),  # fully OOV -> floor
    ]
    model = ngram_lm_train(
        spark.createDataFrame([(t,) for t in train_rows], "text string")
    )
    got = {
        r["doc_id"]: (r["n_events"], r["s6"], r["ppl"])
        for r in ngram_lm_score(
            spark.createDataFrame(score_rows, "doc_id long, text string"),
            model,
        ).collect()
    }

    c = {1: Counter(), 2: Counter(), 3: Counter()}
    for t in train_rows:
        s = ["<s>", "<s>"] + t.split() + ["</s>"]
        for o in (1, 2, 3):
            for i in range(len(s) - o + 1):
                c[o][tuple(s[i : i + o])] += 1
    n_tot = sum(c[1].values())

    def lp6(num, den):
        return round(math.log(num / den) * 1e6)

    branch_seen = set()
    for doc_id, text in score_rows:
        s = ["<s>", "<s>"] + text.split() + ["</s>"]
        s6 = 0
        n_ev = len(s) - 2
        for i in range(n_ev):
            g = tuple(s[i : i + 3])
            if g in c[3]:
                s6 += lp6(c[3][g], c[2][g[:2]])
                branch_seen.add("tri")
            elif g[1:] in c[2]:
                s6 += _SB_ALPHA6 + lp6(c[2][g[1:]], c[1][g[1:2]])
                branch_seen.add("bi")
            elif g[2:] in c[1]:
                s6 += 2 * _SB_ALPHA6 + lp6(c[1][g[2:]], n_tot)
                branch_seen.add("uni")
            else:
                s6 += 2 * _SB_ALPHA6 + lp6(1, n_tot)
                branch_seen.add("oov")
        ppl = round(math.exp(-s6 / (n_ev * 1e6)), 4)
        assert got[doc_id] == (n_ev, s6, ppl), doc_id
        assert n_ev == len(text.split()) + 1
    assert branch_seen == {"tri", "bi", "uni", "oov"}


def test_ngram_lm_score_driver_tier_equals_distributed(spark, monkeypatch):
    """The bounded-model driver fast tier (collect the vocabulary-
    sized model once, run the backoff chain in one Arrow pass) must be
    row-for-row identical to the distributed suffix-join path — pinned
    by forcing the budget to 0 so the SAME inputs take the join path.
    Covers every backoff branch (the fixture of the branch test) at
    n=3 and the bigram order."""
    from job_post_similarity_spark.operators import text_analysis as ta

    train = spark.createDataFrame(
        [("the cat sat on the mat",), ("the dog sat on the log",)],
        "text string",
    )
    score_rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the mat"),
        (3, "mat the cat"),
        (4, "zzz qqq"),
        (5, None),
        (6, "   "),
    ]
    docs = spark.createDataFrame(score_rows, "doc_id long, text string")
    for n in (2, 3):
        model = ta.ngram_lm_train(train, n=n)
        fast = sorted(
            tuple(r) for r in ta.ngram_lm_score(docs, model).collect()
        )
        monkeypatch.setattr(ta, "_NGLM_DRIVER_BUDGET", 0)
        slow = sorted(
            tuple(r) for r in ta.ngram_lm_score(docs, model).collect()
        )
        monkeypatch.setattr(ta, "_NGLM_DRIVER_BUDGET", 200_000)
        assert fast == slow and len(fast) == 4


def test_ngram_lm_order_validation_and_bigram_order(spark):
    """n outside 2..5 raises; n=2 trains a bigram model whose score
    chain has ONE backoff step (alpha6 + unigram) before the floor."""
    import math
    import pytest as _pytest
    from collections import Counter

    from job_post_similarity_spark.operators.text_analysis import (
        _SB_ALPHA6,
        ngram_lm_score,
        ngram_lm_train,
    )

    df = spark.createDataFrame([("a b",)], "text string")
    with _pytest.raises(ValueError):
        ngram_lm_train(df, n=1)
    with _pytest.raises(ValueError):
        ngram_lm_train(df, n=6)

    model = ngram_lm_train(
        spark.createDataFrame([("a b a b",)], "text string"), n=2
    )
    got = ngram_lm_score(
        spark.createDataFrame([(1, "a zz")], "doc_id long, text string"),
        model,
    ).collect()[0]
    # stream <s> a zz </s>: events (<s>,a) seen, (a,zz) OOV floor,
    # (zz,</s>) bigram-unseen but </s> unigram seen
    c1 = Counter({"<s>": 1, "a": 2, "b": 2, "</s>": 1})
    n_tot = 6

    def lp6(num, den):
        return round(math.log(num / den) * 1e6)

    exp_s6 = (
        lp6(1, 1)  # c2(<s>,a)/c1(<s>)
        + (_SB_ALPHA6 + lp6(1, n_tot))  # zz OOV floor
        + (_SB_ALPHA6 + lp6(c1["</s>"], n_tot))  # </s> unigram backoff
    )
    assert (got["n_events"], got["s6"]) == (3, exp_s6)


def test_wordpiece_train_matches_local_reference_and_differs_from_bpe(
    spark,
):
    """The WordPiece trainer equals a pure-Python replay of its spec
    (weighted symbol/pair counts over the double-separator encoding,
    argmax of round((ln c_ab − ln c_a − ln c_b)·1e6), leftmost-greedy
    replace), and on a corpus where the most FREQUENT pair is not the
    most ASSOCIATED one its first merge differs from BPE's — the
    criterion, not just the plumbing, is under test."""
    import math
    from collections import Counter

    from job_post_similarity_spark.operators.text_analysis import (
        bpe_train_distributed,
        wordpiece_train_distributed,
    )

    # 'qz' is perfectly associated (q never appears without z);
    # 'th'/'he' are frequent but their symbols are diluted by many
    # other words -> BPE merges the frequent pair, WordPiece 'qz</w>'
    rows = [
        ("the then they them there " * 3,),
        ("qz qz qz " * 2,),
        ("ha he hi ho hu ta te ti to tu " * 2,),
    ]
    docs = spark.createDataFrame(rows, "text string")
    got = [
        (r["step"], r["sym_left"], r["sym_right"], r["pair_count"],
         r["score6"])
        for r in wordpiece_train_distributed(
            docs, num_merges=4, min_count=2
        ).collect()
    ]

    # pure-Python replay
    words = Counter()
    for (t,) in rows:
        for w in t.lower().split():
            if w.isalpha():
                words[w] += 1
    vocab = {
        tuple([*w[:-1], w[-1] + "</w>"]): c for w, c in words.items()
    }
    exp = []
    for step in range(1, 5):
        syms = Counter()
        pairs = Counter()
        for ss, c in vocab.items():
            for s in ss:
                syms[s] += c
            for a, b in zip(ss, ss[1:]):
                pairs[(a, b)] += c
        scored = [
            (
                round(
                    (math.log(pc) - math.log(syms[a]) - math.log(syms[b]))
                    * 1e6
                ),
                a,
                b,
                pc,
            )
            for (a, b), pc in pairs.items()
            if pc >= 2
        ]
        if not scored:
            break
        # tie-break (score6 desc, l asc, r asc):
        best = sorted(scored, key=lambda t: (-t[0], t[1], t[2]))[0]
        s6, a, b, pc = best
        exp.append((step, a, b, pc, s6))
        new_vocab = Counter()
        for ss, c in vocab.items():
            out = []
            i = 0
            while i < len(ss):
                if i + 1 < len(ss) and ss[i] == a and ss[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(ss[i])
                    i += 1
            new_vocab[tuple(out)] += c
        vocab = new_vocab
    assert got == exp

    bpe_first = bpe_train_distributed(
        docs, num_merges=1, min_count=2
    ).collect()[0]
    assert (got[0][1], got[0][2]) != (
        bpe_first["sym_left"],
        bpe_first["sym_right"],
    )
    assert got[0][1] == "q"  # the associated pair wins under WordPiece
