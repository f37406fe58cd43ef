"""Analytic window family: running/ntile/rank-stats/range-frame
(operators/windows.py)."""

import pytest
from pyspark.sql import functions as F


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_running_agg_cumulative_per_partition(spark):
    from job_post_similarity_spark.operators import windows as W

    df = _df(
        spark,
        [("a", 1, 10.0), ("a", 2, 5.0), ("a", 3, 1.0), ("b", 1, 7.0)],
        "k string, seq int, v double",
    )
    out = W.running_agg(
        df, ["k"], [F.asc("seq")], F.col("v"), "run"
    ).orderBy("k", "seq")
    got = [(r.k, r.seq, r.run) for r in out.collect()]
    assert got == [("a", 1, 10.0), ("a", 2, 15.0), ("a", 3, 16.0), ("b", 1, 7.0)]


def test_ntile_buckets_remainder_to_front(spark):
    from job_post_similarity_spark.operators import windows as W

    # 5 rows into 4 buckets: sizes 2,1,1,1 (SQL ntile semantics).
    df = _df(spark, [("a", i) for i in range(5)], "k string, seq int")
    out = W.ntile_buckets(df, ["k"], [F.asc("seq")], 4, "b")
    sizes = sorted(
        (r.b, r.cnt)
        for r in out.groupBy("b").agg(F.count("*").alias("cnt")).collect()
    )
    assert sizes == [(1, 2), (2, 1), (3, 1), (4, 1)]


def test_rank_stats_tie_peers_share_values(spark):
    from job_post_similarity_spark.operators import windows as W

    df = _df(
        spark,
        [("a", 1, 5.0), ("a", 2, 5.0), ("a", 3, 9.0)],
        "k string, id int, v double",
    )
    out = W.rank_stats(df, ["k"], [F.asc("v")]).orderBy("id")
    rows = out.collect()
    # The two tied rows share pct_rank 0 and cume_dist 2/3.
    assert rows[0].pct_rank == rows[1].pct_rank == 0.0
    assert rows[0].cume_dist == rows[1].cume_dist == pytest.approx(2 / 3)
    assert rows[2].pct_rank == 1.0 and rows[2].cume_dist == 1.0


def test_range_frame_includes_ties_and_bounds(spark):
    from job_post_similarity_spark.operators import windows as W

    # keys 0,10,10,25 with width 15: row at 25 sees both 10-peers but
    # not 0; each 10-peer sees the other (RANGE, not ROWS).
    df = _df(
        spark,
        [("a", 1, 0, 1.0), ("a", 2, 10, 2.0), ("a", 3, 10, 4.0), ("a", 4, 25, 8.0)],
        "k string, id int, key int, v double",
    )
    out = W.range_frame_agg(df, ["k"], F.col("key"), F.col("v"), 15, "s")
    got = {r.id: r.s for r in out.collect()}
    assert got == {1: 1.0, 2: 7.0, 3: 7.0, 4: 14.0}


def test_window_family_single_shuffle(spark):
    """The running aggregate plans exactly one Exchange (the partition
    key shuffle) — the 100 TB contract for the whole family."""
    from job_post_similarity_spark.operators import windows as W

    df = _df(
        spark,
        [("a", i, float(i)) for i in range(100)],
        "k string, seq int, v double",
    )
    out = W.running_agg(df, ["k"], [F.asc("seq")], F.col("v"), "run")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_cube_counts_covers_all_grouping_sets(spark, sf_dir):
    """CUBE must equal the union of plain groupBys over every dim
    subset (subtotals null-marked), in ONE expand+aggregate plan."""
    from job_post_similarity_spark.operators.profiling import cube_counts
    from job_post_similarity_spark.sources.io import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    out = cube_counts(
        o, ["o_orderstatus", "o_orderpriority"], value_col="o_totalprice"
    ).collect()
    got = {
        (r["o_orderstatus"], r["o_orderpriority"]): r["cnt"] for r in out
    }
    # grand total
    assert got[(None, None)] == o.count()
    # one-dim subtotals match plain groupBy
    per_status = {
        r["o_orderstatus"]: r["count"]
        for r in o.groupBy("o_orderstatus").count().collect()
    }
    for s, c in per_status.items():
        assert got[(s, None)] == c
    per_prio = {
        r["o_orderpriority"]: r["count"]
        for r in o.groupBy("o_orderpriority").count().collect()
    }
    for p, c in per_prio.items():
        assert got[(None, p)] == c
    # finest level
    fine = o.groupBy("o_orderstatus", "o_orderpriority").count().collect()
    for r in fine:
        assert got[(r["o_orderstatus"], r["o_orderpriority"])] == r["count"]
    # single Expand + aggregation, not 2^n scans
    plan = cube_counts(o, ["o_orderstatus", "o_orderpriority"])._jdf \
        .queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
    import re
    assert len(re.findall(r"^\(\d+\) Expand", plan, re.M)) == 1
    assert len(re.findall(r"^\(\d+\) Scan", plan, re.M)) == 1


def test_funnel_counts_in_order_subsequence(spark):
    """Stage k requires steps 0..k in order: out-of-order purchase
    does not count; repeats are fine; later stages never exceed
    earlier ones."""
    from job_post_similarity_spark.operators.windows import funnel_counts

    rows = [
        # u1: full funnel, interleaved noise
        (1, 1, "signup"), (1, 2, "view"), (1, 3, "click"), (1, 4, "purchase"),
        # u2: purchase BEFORE click -> reaches stage 1 only... except a
        # second click->purchase never comes
        (2, 1, "signup"), (2, 2, "purchase"), (2, 3, "click"),
        # u3: no signup at all -> stage 0
        (3, 1, "click"), (3, 2, "purchase"),
        # u4: signup then click, no purchase
        (4, 1, "signup"), (4, 2, "click"),
    ]
    df = spark.createDataFrame(rows, "u long, t long, step string")
    out = {
        r["stage"]: (r["step"], r["entities"])
        for r in funnel_counts(
            df, "u", "step", ["t"], ["signup", "click", "purchase"]
        ).collect()
    }
    assert out == {
        1: ("signup", 3),
        2: ("click", 3),
        3: ("purchase", 1),
    }


def test_table_diff_statuses(spark):
    from job_post_similarity_spark.operators.profiling import table_diff

    left = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0)],
        "k long, s string, v double",
    )
    right = spark.createDataFrame(
        [(2, "b", None), (3, "C", 3.0), (4, "d", 4.0)],
        "k long, s string, v double",
    )
    out = {r["k"]: r["status"] for r in table_diff(left, right, ["k"]).collect()}
    # k=2 identical (null-safe!) -> absent; 1 removed; 3 changed; 4 added
    assert out == {1: "removed", 3: "changed", 4: "added"}


def test_stream_expectation_monitor_equals_batch(spark, sf_dir):
    """The streaming windowed DQ report on bounded input equals the
    batch windowed conditional counts."""
    from job_post_similarity_spark.sources.io import load_table
    from job_post_similarity_spark.streaming import (
        stream_expectation_monitor,
    )

    got = {
        tuple(r)
        for r in stream_expectation_monitor(
            spark, sf_dir, name="dq_eq_test"
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    batch = ev.groupBy(
        F.date_trunc("day", "ts").alias("window_start")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("user_id").isNull(), 1).otherwise(0)
        ).alias("viol_user_present"),
        F.sum(
            F.when(
                F.col("value").isNull() | ~(F.col("value") <= 400), 1
            ).otherwise(0)
        ).alias("viol_value_below_400"),
        F.sum(
            F.when(
                F.col("value").isNull() | ~(F.col("value") > 0), 1
            ).otherwise(0)
        ).alias("viol_value_positive"),
    )
    assert got == {tuple(r) for r in batch.collect()}
    assert got  # non-empty


def test_stream_to_parquet_checkpoint_no_reprocess(spark, sf_dir, tmp_path):
    """The durable parquet sink: first run drains the source and
    writes every event exactly once; a RESTART over the same
    checkpoint processes zero new batches and appends nothing."""
    from job_post_similarity_spark.sources.io import load_table
    from job_post_similarity_spark.streaming import stream_to_parquet

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    rows1 = stream_to_parquet(spark, sf_dir, out, ckpt)
    n_src = load_table(spark, sf_dir, "events").count()
    assert rows1 == n_src
    first = spark.read.parquet(out)
    assert first.count() == n_src
    # restart: same checkpoint, nothing new to process — via the
    # AvailableNow trigger (mode mix across restarts is supported)
    rows2 = stream_to_parquet(
        spark, sf_dir, out, ckpt, available_now=True
    )
    assert rows2 == 0
    assert spark.read.parquet(out).count() == n_src


def test_stream_upsert_foreach_batch_keeps_latest(spark, sf_dir, tmp_path):
    """foreachBatch MERGE sink: the target ends with one row per key —
    the latest by ts — matching the batch keep_latest of the whole
    source."""
    from job_post_similarity_spark.operators.preprocess import keep_latest
    from job_post_similarity_spark.sources.io import load_table
    from job_post_similarity_spark.streaming import (
        stream_upsert_foreach_batch,
    )

    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt2")
    stream_upsert_foreach_batch(spark, sf_dir, target, ckpt)
    got = spark.read.parquet(target)
    ev = load_table(spark, sf_dir, "events")
    want = keep_latest(
        ev, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
    )
    assert got.count() == want.count()
    # one row per key, and each key's ts is the max for that key
    mx = {r["user_id"]: r["ts"] for r in
          ev.groupBy("user_id").agg(F.max("ts").alias("ts")).collect()}
    rows = got.collect()
    assert len({r["user_id"] for r in rows}) == len(rows)
    for r in rows:
        assert r["ts"] == mx[r["user_id"]]


def test_seasonality_profile_index(spark):
    import datetime as dt

    from job_post_similarity_spark.operators.windows import (
        seasonality_profile,
    )

    # 2024-01-01 is a Monday; plant double volume on Mondays
    rows = []
    for d in range(14):
        day = dt.datetime(2024, 1, 1) + dt.timedelta(days=d)
        n = 2 if day.weekday() == 0 else 1
        for i in range(n):
            rows.append((day + dt.timedelta(hours=i), 10.0))
    rows.append((None, 99.0))  # null ts excluded
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {r["dow"]: r for r in
           seasonality_profile(df, "ts", "value").collect()}
    assert set(out) == set(range(1, 8))
    assert out[1]["n_events"] == 4          # doubled Mondays
    assert all(out[d]["n_events"] == 2 for d in range(2, 8))
    # grand total 16 events * 1000 cents; Monday index = 7*4/16
    assert out[1]["index_ppm"] == 7 * 1_000_000 * 4000 // 16000
    assert out[2]["index_ppm"] == 7 * 1_000_000 * 2000 // 16000
    # count-only mode
    cnt = {r["dow"]: r["index_ppm"] for r in
           seasonality_profile(df, "ts").collect()}
    assert cnt[1] == 7 * 1_000_000 * 4 // 16


def test_stream_psi_drift_self_reference_near_zero(spark, sf_dir):
    """Daily windows of the SAME corpus used as reference must score
    low PSI (each day is a sample of the reference distribution),
    and every window's event count must reconcile with batch."""
    from job_post_similarity_spark.sources.io import load_table
    from job_post_similarity_spark.streaming import stream_psi_drift

    ev = load_table(spark, sf_dir, "events")
    out = stream_psi_drift(
        spark, sf_dir, ev, "value", n_bins=10, name="psi_eq_test"
    ).collect()
    assert out  # at least one window
    n_total = sum(r["n_new"] for r in out)
    assert n_total == ev.filter(F.col("value").isNotNull()).count()
    # daily samples of the reference itself: bounded PSI. NB the
    # absolute level is sample-size-driven — ~25 events per day over
    # 10 bins puts smoothing noise at ~0.3; the gate's DuckDB oracle
    # checks the VALUES, this test checks the reconciliation contract
    assert all(abs(r["psi6"]) / 1e6 < 1.0 for r in out)
    ev_days = (
        ev.filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select(F.date_trunc("day", "ts"))
        .distinct()
        .count()
    )
    assert len(out) == ev_days


def test_ohlc_bars_hand_example(spark):
    from job_post_similarity_spark.operators.windows import ohlc_bars

    df = spark.createDataFrame(
        [
            ("a", "2024-01-01 10:00:01", 5.0),
            ("a", "2024-01-01 10:10:00", 9.0),
            ("a", "2024-01-01 10:50:00", 2.0),
            ("a", "2024-01-01 11:00:00", 7.0),
            # duplicate-ts tie: open takes the MIN value at min ts
            ("b", "2024-01-01 10:00:00", 4.0),
            ("b", "2024-01-01 10:00:00", 3.0),
            ("a", "2024-01-01 10:30:00", None),
        ],
        "event_type string, ts_s string, value double",
    ).selectExpr(
        "event_type", "CAST(ts_s AS TIMESTAMP) AS ts", "value"
    )
    rows = {
        (r["event_type"], str(r["bar_ts"])): (
            r["open"], r["high"], r["low"], r["close"], r["n"]
        )
        for r in ohlc_bars(df, key_col="event_type").collect()
    }
    assert rows[("a", "2024-01-01 10:00:00")] == (5.0, 9.0, 2.0, 2.0, 3)
    assert rows[("a", "2024-01-01 11:00:00")] == (7.0, 7.0, 7.0, 7.0, 1)
    # duplicate timestamps: open = min value, close = max value
    assert rows[("b", "2024-01-01 10:00:00")] == (3.0, 4.0, 3.0, 4.0, 2)


def test_global_rank_matches_single_partition_window(spark, sf_dir):
    """The two-phase exact rank must be bit-identical to the
    single-partition Window.orderBy row_number it replaces."""
    from pyspark.sql import Window, functions as F

    from job_post_similarity_spark.operators.windows import global_rank
    from job_post_similarity_spark.sources.io import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    order = [F.asc("value"), F.asc("event_id")]
    got = {
        r["event_id"]: r["rank"]
        for r in global_rank(ev, order).collect()
    }
    w = Window.orderBy(*order)
    want = {
        r["event_id"]: r["rank"]
        for r in ev.withColumn(
            "rank", F.row_number().over(w).cast("long")
        ).collect()
    }
    assert got == want


def test_global_ntile_matches_f_ntile(spark, sf_dir):
    """global_ntile == F.ntile over a global window, including the
    remainder-rows-go-to-first-buckets SQL semantics, for bucket
    counts that do and don't divide the row count."""
    from pyspark.sql import Window, functions as F

    from job_post_similarity_spark.operators.windows import global_ntile
    from job_post_similarity_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    order = [F.asc("n_chars"), F.asc("doc_id")]
    for n in (3, 7):
        got = {
            r["doc_id"]: r["bucket"]
            for r in global_ntile(docs, n, order).collect()
        }
        w = Window.orderBy(*order)
        want = {
            r["doc_id"]: r["bucket"]
            for r in docs.withColumn("bucket", F.ntile(n).over(w)).collect()
        }
        assert got == want


def test_global_rank_plan_has_no_unpartitioned_window(spark, sf_dir):
    """The plan must carry a partition-local Window only (partitionBy
    __pid) — never the single-partition global WindowExec."""
    from pyspark.sql import functions as F

    from job_post_similarity_spark.operators.windows import global_rank
    from job_post_similarity_spark.sources.io import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    df = global_rank(ev, [F.asc("value"), F.asc("event_id")])
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Window \[.*?\]", plan):
        assert "__pid" in m.group(0), m.group(0)


def test_state_store_reader_matches_aggregate(spark, tmp_path):
    """The statestore source must expose exactly the stateful
    operator's accumulated (key, count) state, and state-metadata
    must describe the store."""
    from pyspark.sql import functions as F

    from job_post_similarity_spark.streaming import (
        read_state_metadata,
        read_state_store,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    spark.range(12).selectExpr("id", "id % 3 as k").write.mode(
        "overwrite"
    ).parquet(src)
    sdf = spark.readStream.schema("id long, k long").parquet(src)
    q = (
        sdf.groupBy("k")
        .count()
        .writeStream.format("memory")
        .queryName("ss_reader_probe")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    state = {
        r["key"]["k"]: r["value"]["count"]
        for r in read_state_store(spark, ckpt).collect()
    }
    assert state == {0: 4, 1: 4, 2: 4}
    md = read_state_metadata(spark, ckpt).collect()
    assert md and md[0]["operatorName"] == "stateStoreSave"


@pytest.mark.extras
def test_tws_running_counts_env_gated(spark, sf_dir):
    """transformWithStateInPandas twin: equals the batch groupBy when
    protobuf is present; raises the documented ImportError when not
    (this container lacks google.protobuf — the torch/faiss policy)."""
    import pytest

    from job_post_similarity_spark.sources.io import load_table
    from job_post_similarity_spark.streaming.stream_ops import (
        stream_running_counts_tws,
        tws_available,
    )
    from pyspark.sql import functions as F

    if not tws_available():
        with pytest.raises(ImportError, match="protobuf"):
            stream_running_counts_tws(spark, sf_dir)
        pytest.skip(
            "google.protobuf absent — extras lane: pip install -r "
            "requirements-extras.txt && pytest -m extras"
        )
    got = {
        r["event_type"]: r["cnt"]
        for r in stream_running_counts_tws(spark, sf_dir).collect()
    }
    want = {
        r["event_type"]: r["cnt"]
        for r in load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull())
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want
