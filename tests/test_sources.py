"""CSV/file ingest (S9 cranlogs pattern) + Measure NA-fill parity."""

import pytest
from pyspark.sql import functions as F

from data_cube_spark.model import Measure
from data_cube_spark.sources.ingest import cube_from_file, surrogate_keyed_star

CSV = """day,package,country,downloads
2024-01-01,dplyr,US,10
2024-01-01,dplyr,DE,5
2024-01-01,ggplot2,US,7
2024-01-02,dplyr,US,3
"""


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("ingest") / "logs.csv"
    p.write_text(CSV)
    return str(p)


def test_cube_from_csv(spark, csv_path):
    dc = cube_from_file(
        spark, csv_path,
        dims={"package": "package", "country": "country"},
        measures=[Measure("downloads", agg="sum"), Measure("n", "day", agg="count")],
    )
    rows = {(r.package, r.country): (r.downloads, r.n)
            for r in dc.fact.df.collect()}
    assert rows == {("dplyr", "US"): (13, 2), ("dplyr", "DE"): (5, 1),
                    ("ggplot2", "US"): (7, 1)}
    assert dc.dims["package"].base.count() == 2


def test_surrogate_keyed_star(spark, csv_path):
    from data_cube_spark.sources.ingest import read_source

    df = read_source(spark, csv_path)
    fact, dims = surrogate_keyed_star(
        df, {"pkg": ["package"], "geo": ["country"]},
        measures=[Measure("downloads", agg="sum")],
    )
    assert set(fact.columns) == {"pkg_key", "geo_key", "downloads", "count"}
    assert fact.count() == 3  # (dplyr,US) (dplyr,DE) (ggplot2,US)
    assert dims["pkg"].count() == 2 and dims["geo"].count() == 2
    # keys join back to natural values losslessly
    joined = fact.join(dims["pkg"], "pkg_key").join(dims["geo"], "geo_key")
    got = {(r.package, r.country): r.downloads for r in joined.collect()}
    assert got[("dplyr", "US")] == 13


def test_measure_fill_all_null_group(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", None), ("b", 2.0)], "k string, v double"
    )
    m_fill = Measure("s", "v", agg="sum", fill=0.0)
    m_plain = Measure("s0", "v", agg="sum")
    out = {r.k: (r.s, r.s0)
           for r in df.groupBy("k").agg(m_fill.build_expr(), m_plain.build_expr()).collect()}
    assert out["a"] == (0.0, None)  # R sum(na.rm=TRUE) parity vs SQL null
    assert out["b"] == (2.0, 2.0)


def test_cube_save_load_round_trip(spark, tmp_path):
    from data_cube_spark.sources.star import tpch_cube
    from data_cube_spark.sources.store import load_cube, save_cube

    from tests.conftest import SF_DIR

    dc = tpch_cube(spark, SF_DIR)
    path = str(tmp_path / "cube_store")
    save_cube(dc, path)
    loaded = load_cube(spark, path)

    assert loaded.fact.id_vars == dc.fact.id_vars
    assert set(loaded.measures) == set(dc.measures)
    assert set(loaded.dims) == set(dc.dims)
    # queries over the loaded cube equal the original
    a = sorted(map(tuple, dc.aggregate(["supplier.r_name"]).collect()))
    b = sorted(map(tuple, loaded.aggregate(["supplier.r_name"]).collect()))
    assert a == b
    # dice + collapse works on the loaded cube
    from data_cube_spark.selectors import C, Collapse

    q = loaded.q(supplier=C(r_name=["EUROPE"]), part=Collapse(),
                 orders=Collapse())
    assert q.fact.df.count() > 0


def test_cube_save_load_bucketed_fact(spark, tmp_path):
    """save_cube(bucket_by=...) persists the fact bucketed; load_cube
    re-registers it CLUSTERED BY from cube.json, so a later-session
    aggregation on the bucket key runs with ZERO exchanges (the fact
    shuffle was paid once at save time). Values identical to the plain
    roundtrip."""
    from data_cube_spark.plans import count_exchanges, explain_str
    from data_cube_spark.sources.star import tpch_cube
    from data_cube_spark.sources.store import load_cube, save_cube

    from tests.conftest import SF_DIR

    dc = tpch_cube(spark, SF_DIR)
    path = str(tmp_path / "cube_store_b")
    save_cube(dc, path, bucket_by=["o_orderkey"], n_buckets=4)
    import glob as _glob
    assert len(_glob.glob(f"{path}/fact/*.parquet")) == 4
    try:
        loaded = load_cube(spark, path, fact_table="t_cube_fact_bucketed")
        a = sorted(map(tuple, dc.aggregate(["supplier.r_name"]).collect()))
        b = sorted(map(tuple, loaded.aggregate(["supplier.r_name"]).collect()))
        assert a == b
        # the bucket-key aggregation needs no shuffle at all
        agg = loaded.fact.df.groupBy("o_orderkey").agg(F.sum("revenue"))
        assert count_exchanges(agg) == 0, explain_str(agg, "simple")
        assert "Bucketed: true" in explain_str(agg, "simple")
        # without fact_table the load still answers correctly (plain read)
        plain = load_cube(spark, path)
        c = sorted(map(tuple, plain.aggregate(["supplier.r_name"]).collect()))
        assert a == c
    finally:
        spark.sql("DROP TABLE IF EXISTS t_cube_fact_bucketed")


def test_compact_parquet_merges_small_files(spark, tmp_path):
    """Compaction rewrites a fragmented dataset into few files with
    identical contents; with sort_cols the output is range-laid-out.
    A stale tmp dir from a 'crashed' prior run is ignored."""
    import glob

    from data_cube_spark.sources.ingest import compact_parquet

    path = str(tmp_path / "frag")
    df = spark.range(10000).select(
        F.col("id"), (F.col("id") % 7).alias("g"))
    df.repartition(64).write.parquet(path)  # 64 tiny files
    assert len(glob.glob(f"{path}/*.parquet")) == 64
    # simulate a crashed earlier compaction
    (tmp_path / "frag._compact_tmp").mkdir()
    n = compact_parquet(spark, path, target_file_mb=256, sort_cols=["id"])
    files = glob.glob(f"{path}/*.parquet")
    assert n == len(files) == 1  # tiny data -> one file
    back = spark.read.parquet(path)
    assert back.count() == 10000
    assert back.agg(F.sum("id")).first()[0] == sum(range(10000))


def test_compact_parquet_refuses_partitioned_root(spark, tmp_path):
    """Compacting through a hive-partitioned root would flatten the
    partition columns into the files — must refuse loudly."""
    from data_cube_spark.sources.ingest import compact_parquet

    path = str(tmp_path / "part")
    df = spark.range(100).select(F.col("id"), (F.col("id") % 3).alias("g"))
    df.write.partitionBy("g").parquet(path)
    with pytest.raises(ValueError, match="hive-partitioned"):
        compact_parquet(spark, path)
    # each leaf partition compacts fine
    n = compact_parquet(spark, f"{path}/g=0")
    assert n == 1


def test_save_cube_rejects_callable_measures(spark, tmp_path):
    from data_cube_spark.build import from_table
    from data_cube_spark.sources.store import save_cube

    df = spark.createDataFrame([(1, 2.0)], "k int, v double")
    dc = from_table(df, {"d": "k"}, [Measure("m", "v", agg=lambda s: float(s.sum()))])
    with pytest.raises(ValueError):
        save_cube(dc, str(tmp_path / "bad"))


def test_write_range_layout_files_cover_disjoint_ranges(spark, tables, tmp_path):
    """Every output file's (min, max) interval of the sort key must be
    disjoint from every other file's — the property parquet footer
    statistics need for driver-side file/row-group pruning."""
    import pyarrow.parquet as pq

    from data_cube_spark.sources.ingest import write_range_layout

    path = str(tmp_path / "range_layout")
    write_range_layout(
        tables["lineitem"].select("l_orderkey", "l_quantity"),
        path, ["l_orderkey"], n_files=8)

    import glob
    spans = []
    for f in sorted(glob.glob(path + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(0).statistics
            mins.append(st.min); maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    assert len(spans) > 1
    spans.sort()
    for (lo_a, hi_a), (lo_b, _) in zip(spans, spans[1:]):
        assert hi_a <= lo_b, f"overlapping file ranges: {spans}"

    # and the filter actually reaches the scan
    from data_cube_spark.plans import pushed_filters
    back = spark.read.parquet(path).where(F.col("l_orderkey") < 100)
    assert "l_orderkey" in pushed_filters(back)


def test_cli_list_and_unknown_query(capsys):
    from data_cube_spark.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "flagship_revenue_by_region  [oracle]" in out
    assert main(["run", "no_such_query"]) == 2


def test_write_training_shards_layout_and_manifest(spark, tables, tmp_path):
    """Output is hive-partitioned by (split, shard), the manifest row
    counts match the data, and reading one shard directory touches only
    that partition."""
    import json

    from data_cube_spark.operators.sampling import assign_split
    from data_cube_spark.operators.text import token_count
    from data_cube_spark.sources.ingest import write_training_shards

    docs = assign_split(tables["documents"],
                        {"train": 0.8, "val": 0.2}).select(
        "doc_id", "split",
        (F.col("doc_id") % 4).cast("int").alias("shard"),
        token_count("text").alias("n_tokens"))
    path = str(tmp_path / "shards")
    manifest = write_training_shards(docs, path)

    assert manifest["total_rows"] == docs.count()
    by_key = {(p["split"], p["shard"]): p["rows"] for p in manifest["partitions"]}
    actual = {(r["split"], r["shard"]): r["n"] for r in
              docs.groupBy("split", "shard").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_key == actual

    one = spark.read.parquet(path + "/split=train/shard=0")
    assert one.count() == by_key[("train", 0)]
    # the whole dataset root must also be readable: the manifest is
    # underscore-prefixed so partition discovery ignores it
    whole = spark.read.parquet(path)
    assert whole.count() == manifest["total_rows"]
    disk = json.load(open(path + "/_manifest.json"))
    assert disk == manifest


def test_driver_rotation_orders_unchecked_first():
    """queries() must list registry entries with no CORRECTNESS row ahead
    of previously-verified ones (stalest-first after that), determin-
    istically, and cover the whole registry exactly once."""
    import __spark_entry__ as e
    from data_cube_spark.registry import QUERIES

    order = list(e.queries())
    assert sorted(order) == sorted(QUERIES)
    assert order == list(e.queries())  # deterministic
    seen = e._evidence_rounds()
    ranks = [seen.get(n, 0) for n in order]
    assert ranks == sorted(ranks), "checked queries must not precede unchecked"


def _file_spans(path, col_name):
    """Per-file (min, max) of a column from parquet footer statistics."""
    import glob

    import pyarrow.parquet as pq

    spans = []
    for f in sorted(glob.glob(path + "/*.parquet")):
        md = pq.ParquetFile(f).metadata
        schema_names = md.schema.names
        ci = schema_names.index(col_name)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    return spans


def test_write_zorder_layout_prunes_both_columns(spark, tables, tmp_path):
    """Z-order layout: each file covers a region bounded in BOTH
    interleaved columns, so footer min/max prunes files for a predicate
    on the second column — which a 1-D range layout on the first column
    cannot do — and the layout never changes query results."""
    from data_cube_spark.sources.ingest import (
        write_range_layout,
        write_zorder_layout,
    )

    ev = tables["events"].select("user_id", "value", "event_type")
    zpath = str(tmp_path / "zorder")
    rpath = str(tmp_path / "range1d")
    write_zorder_layout(ev, zpath, ["user_id", "value"], n_files=16)
    write_range_layout(ev, rpath, ["user_id"], n_files=16)

    # a band strictly inside one rank-space quadrant (a band straddling
    # the median boundary touches both halves of the curve by design)
    lo, hi = ev.stat.approxQuantile("value", [0.55, 0.65], 0.001)

    def overlapping(spans):
        return sum(1 for mn, mx in spans if mx >= lo and mn <= hi)

    z_spans = _file_spans(zpath, "value")
    r_spans = _file_spans(rpath, "value")
    # range partitioner may fold near-empty boundary partitions; the
    # comparison is by FRACTION of files a scan must touch
    assert len(z_spans) >= 8 and len(r_spans) >= 8
    # 1-D layout on user_id leaves (nearly) every file overlapping a
    # value band; the Z layout must prune at least half
    assert overlapping(r_spans) >= 0.9 * len(r_spans)
    assert overlapping(z_spans) <= 0.5 * len(z_spans)
    # and user_id pruning survives the interleave: a narrow user band
    # must not touch every file
    u_lo, u_hi = ev.stat.approxQuantile("user_id", [0.1, 0.2], 0.001)
    z_user_spans = _file_spans(zpath, "user_id")
    z_user = sum(1 for mn, mx in z_user_spans if mx >= u_lo and mn <= u_hi)
    assert z_user <= 0.75 * len(z_user_spans)

    # layout is results-invariant
    pred = (F.col("value") >= lo) & (F.col("value") <= hi)
    assert (spark.read.parquet(zpath).where(pred).count()
            == ev.where(pred).count())

    from data_cube_spark.plans import pushed_filters
    back = spark.read.parquet(zpath).where(F.col("value") >= lo)
    assert "value" in pushed_filters(back)


def test_zorder_key_validation(spark, tables):
    import pytest as _pytest

    from data_cube_spark.sources.ingest import zorder_key

    with _pytest.raises(ValueError):
        zorder_key(tables["events"], ["user_id"])
    with _pytest.raises(ValueError):
        zorder_key(tables["events"], ["user_id", "value"], bits=0)
    keyed, kc = zorder_key(
        tables["events"].select("user_id", "ts", "value"),
        ["user_id", "ts"], bits=4)
    # timestamp columns bucket via epoch seconds; key stays bounded
    row = keyed.agg(F.min(kc), F.max(kc)).collect()[0]
    assert 0 <= row[0] <= row[1] < (1 << 8)
    assert set(keyed.columns) == {"user_id", "ts", "value", kc}


def test_read_source_orc_round_trip(spark, tables, tmp_path):
    """ORC passes through read_source with pushdown intact — format
    breadth for warehouses standardized on ORC."""
    from data_cube_spark.sources.ingest import read_source

    path = str(tmp_path / "orc_events")
    ev = tables["events"].select("event_id", "user_id", "value")
    ev.write.format("orc").save(path)
    back = read_source(spark, path, fmt="orc")
    assert back.count() == ev.count()
    assert sorted(back.columns) == sorted(ev.columns)
    from data_cube_spark.plans import pushed_filters
    assert "user_id" in pushed_filters(back.where(F.col("user_id") < 10))


def test_read_bucketed_guards_missized_broadcast(spark, tables, tmp_path):
    """The r12 sf10 failure in miniature: a narrow bucketed table whose
    COMPRESSED parquet bytes sit under the broadcast threshold while its
    DESERIALIZED rows sit over it. Un-guarded, Catalyst picks a
    broadcast join (sized from file bytes — at sf10 that build blew the
    driver and threw away the bucket layout); read through
    read_bucketed, the scan carries a merge hint and the join plans the
    zero-exchange sort-merge the layout paid for. An explicit
    F.broadcast on the other side still outranks the guard (star joins
    keep their dim broadcasts), and a genuinely broadcast-small table
    stays un-hinted."""
    import glob as _glob
    import os

    from data_cube_spark.plans import count_exchanges, explain_str
    from data_cube_spark.sources.ingest import (
        est_row_bytes,
        read_bucketed,
        write_bucketed,
    )

    write_bucketed(tables["lineitem"].select("l_orderkey", "l_quantity"),
                   "t_rb_li", ["l_orderkey"], n_buckets=4,
                   path=str(tmp_path / "li"))
    write_bucketed(tables["orders"].select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"),
        "t_rb_o", ["l_orderkey"], n_buckets=4, path=str(tmp_path / "o"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # pick a threshold BETWEEN the compressed footprint and the
        # deserialized estimate — the exact regime that mis-sized sf10
        comp = sum(os.path.getsize(p) for p in
                   _glob.glob(str(tmp_path / "o" / "*.parquet")))
        o = spark.table("t_rb_o")
        deser = o.count() * est_row_bytes(o.schema)
        assert comp < deser, "fixture must compress below its row bytes"
        thr = (comp + deser) // 2
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(thr))

        unguarded = spark.table("t_rb_li").join(o, "l_orderkey")
        assert "BroadcastHashJoin" in explain_str(unguarded, "simple"), (
            "fixture no longer reproduces the compressed-bytes "
            "mis-sizing:\n" + explain_str(unguarded, "simple"))

        li_g = read_bucketed(spark, "t_rb_li")
        o_g = read_bucketed(spark, "t_rb_o")
        guarded = li_g.join(o_g, "l_orderkey")
        plan = explain_str(guarded, "simple")
        assert "SortMergeJoin" in plan, plan
        assert count_exchanges(guarded) == 0, plan

        # explicit dim broadcast outranks the merge hint
        dim = spark.createDataFrame(
            [("1-URGENT", 1), ("2-HIGH", 2)], "o_orderpriority string, rank int")
        star = o_g.join(F.broadcast(dim), "o_orderpriority")
        assert "BroadcastHashJoin" in explain_str(star, "simple")

        # genuinely small table stays un-hinted under the default 10MB
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
        small = read_bucketed(spark, "t_rb_o")
        j2 = spark.table("t_rb_li").join(small, "l_orderkey")
        assert "BroadcastHashJoin" in explain_str(j2, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_rb_li")
        spark.sql("DROP TABLE IF EXISTS t_rb_o")


def test_read_guarded_bands_shaped_member(spark, tmp_path):
    """VERDICT r13 #1 done-bar, half one: a ``_bands``-shaped index
    member (narrow all-long rows — band hash + band id + corpus id —
    the dictionary-friendly shape that compresses far below its
    deserialized build size) read through the shared guard pins merge
    when the measured deserialized size tops the broadcast threshold,
    while the raw ``spark.table`` read reproduces the r12 mis-sizing
    (Catalyst broadcasts it off compressed file bytes)."""
    import glob as _glob
    import os

    from data_cube_spark.plans import explain_str
    from data_cube_spark.sources.ingest import (
        read_guarded,
        table_stats,
        write_bucketed,
    )

    bands = spark.range(40_000).select(
        F.col("id").alias("corpus_id"),
        (F.col("id") % 7).alias("_t"),
        (F.col("id") % 997).alias("_b"),
    )
    write_bucketed(bands, "t_rg_bands", ["corpus_id"], n_buckets=4,
                   path=str(tmp_path / "bands"))
    probe = spark.range(200_000).select(F.col("id").alias("corpus_id"),
                                        (F.col("id") % 5).alias("x"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        comp = sum(os.path.getsize(p) for p in
                   _glob.glob(str(tmp_path / "bands" / "*.parquet")))
        n, row_b = table_stats(spark, "t_rg_bands")
        assert n == 40_000
        deser = n * row_b
        assert comp < deser, "fixture must compress below its row bytes"
        thr = int((comp + deser) // 2)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(thr))

        raw = probe.join(spark.table("t_rg_bands"), "corpus_id")
        assert "BroadcastHashJoin" in explain_str(raw, "simple"), (
            "fixture no longer reproduces the compressed-bytes "
            "mis-sizing:\n" + explain_str(raw, "simple"))

        guarded = probe.join(read_guarded(spark, "t_rg_bands"),
                             "corpus_id")
        assert "SortMergeJoin" in explain_str(guarded, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_rg_bands")


def test_read_guarded_sets_shaped_member_array_aware(spark, tmp_path):
    """VERDICT r13 #1 done-bar, half two: a ``_sets``-shaped member
    (array<string> shingle sets) whose STATIC schema estimate — the 40 B
    container floor ADVICE r13 flagged as erring SMALL, not large —
    would still let it broadcast; the measured stats price the actual
    per-element string bytes and the guard pins merge."""
    from data_cube_spark.plans import explain_str
    from data_cube_spark.sources.ingest import (
        est_row_bytes,
        read_guarded,
        table_stats,
        write_bucketed,
    )

    sets = spark.range(3_000).select(
        F.col("id").alias("corpus_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: F.concat(F.lit("shingle_"),
                               (F.col("id") * 64 + i).cast("string")),
        ).alias("_set"),
    )
    write_bucketed(sets, "t_rg_sets", ["corpus_id"], n_buckets=4,
                   path=str(tmp_path / "sets"))
    probe = spark.range(100_000).select(F.col("id").alias("corpus_id"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        n, row_b = table_stats(spark, "t_rg_sets")
        static_b = est_row_bytes(spark.table("t_rg_sets").schema)
        # the whole point: the static floor underestimates arrays 10x+
        assert row_b > 10 * static_b, (n, row_b, static_b)
        # threshold ABOVE the static estimate (static guard would not
        # pin) but BELOW the measured deserialized size (it must pin)
        thr = int((n * static_b + n * row_b) // 2)
        assert n * static_b < thr < n * row_b
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(thr))

        guarded = probe.join(read_guarded(spark, "t_rg_sets"),
                             "corpus_id")
        assert "SortMergeJoin" in explain_str(guarded, "simple"), (
            explain_str(guarded, "simple"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_rg_sets")


def test_table_stats_cached_and_append_refreshes(spark, tmp_path):
    """The guard's sizing job runs once per (session, table, on-disk
    bytes): repeated calls return the SAME cached tuple (no re-count per
    query — VERDICT r13 #1), and an append changes the on-disk bytes so
    the stats refresh without any explicit invalidation hook."""
    from data_cube_spark.sources.ingest import table_stats, write_bucketed

    df = spark.range(1_000).select(F.col("id").alias("k"),
                                   (F.col("id") % 9).alias("v"))
    write_bucketed(df, "t_ts_cache", ["k"], n_buckets=2,
                   path=str(tmp_path / "tsc"))
    try:
        first = table_stats(spark, "t_ts_cache")
        again = table_stats(spark, "t_ts_cache")
        assert again is first, "second call must hit the cache"
        assert first[0] == 1_000

        more = spark.range(1_000, 1_500).select(
            F.col("id").alias("k"), (F.col("id") % 9).alias("v"))
        more.write.insertInto("t_ts_cache")
        refreshed = table_stats(spark, "t_ts_cache")
        assert refreshed[0] == 1_500, "append must refresh the stats"
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ts_cache")


def test_date_level_post_distinct_equals_legacy(spark, tables):
    """r15: the derived calendar (d_date) level dedups the BARE date and
    derives the parts afterwards. Pin equivalence against the legacy
    derive-then-dedup formulation (every part is a deterministic function
    of d_date, so first-row-per-date == derive-after-distinct), and pin
    that the shipped level plan carries no first() aggregates (the dedup
    must be a keys-only aggregate over one date column)."""
    from data_cube_spark.functions import calendar_table, date_parts
    from data_cube_spark.sources.star import orders_dimension

    dim = orders_dimension(tables)
    lvl = dim.levels["d_date"].pristine

    orders = tables["orders"].withColumn(
        "d_date", date_parts("o_orderdate", "d_")["d_date"])
    legacy = orders.select(
        "d_date",
        *[e.alias(n) for n, e in date_parts("d_date", "d_").items()
          if n != "d_date"],
    ).dropDuplicates(["d_date"])

    cols = lvl.columns
    got = sorted(map(tuple, lvl.select(*cols).collect()))
    want = sorted(map(tuple, legacy.select(*cols).collect()))
    assert got and got == want

    plan = lvl._jdf.queryExecution().executedPlan().toString()
    assert "first(" not in plan, "date-level dedup must be keys-only"

    # calendar_table (public API) uses the same post-distinct shape
    cal = calendar_table(tables["orders"], "o_orderdate", "d_")
    got_cal = sorted(map(tuple, cal.select(*cols).collect()))
    assert got_cal == want
    assert "first(" not in cal._jdf.queryExecution().executedPlan().toString()
