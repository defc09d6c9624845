"""SCD Type-2 dimension versioning and Structured Streaming queries
(corpus ingest, exactly-once dedup, streaming cube, SCD2 stream,
stream-stream attribution join)."""

from __future__ import annotations

from data_cube_spark.registry._shared import *  # noqa: F401,F403


def q_documents_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous corpus ingest, emitted as a DRIVER-CHECKABLE stream==
    batch invariant (VERDICT r4 #2): odd-doc_id documents stream in two
    micro-batches through foreachBatch, each banded against the even-doc
    signature index; near-dups of the corpus are suppressed and survivors
    append. The oracle-checkable form emits one row per streamed doc with
    its source content hash (SQL-recomputable), ``stream_eq_batch`` =
    the streamed keep/suppress decision equals the batch twin's
    (``incremental_minhash_pairs`` against the same fixed index — the
    equality tests/test_streaming.py proves), and ``target_text_ok`` =
    kept docs landed in the target byte-identical (TRUE for suppressed).
    All flags are TRUE by construction; the oracle asserts them
    (streaming/cube_stream.py::streaming_corpus_ingest)."""
    import os
    import shutil
    import tempfile

    from data_cube_spark.streaming.cube_stream import streaming_corpus_ingest

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    batch = docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    sigs = dedup.minhash_signatures(
        docs.where(F.col("doc_id") % 2 == 0)).localCheckpoint()
    work = tempfile.mkdtemp(prefix="stream_ingest_")
    try:
        src = os.path.join(work, "src")
        half = batch.approxQuantile("doc_id", [0.5], 0.01)[0]
        batch.where(F.col("doc_id") <= half).coalesce(1).write.mode("overwrite").parquet(src)
        batch.where(F.col("doc_id") > half).coalesce(1).write.mode("append").parquet(src)
        q = streaming_corpus_ingest(
            spark, src, batch.schema, os.path.join(work, "ckpt"),
            os.path.join(work, "target"), sigs,
            threshold=0.3, max_files_per_trigger=1).start()
        # fail loudly on a hung stream — proceeding would silently return
        # whatever partial output reached the target directory
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("documents_stream_ingest: stream did not "
                               "finish within 300 s")
        streamed = spark.read.parquet(os.path.join(work, "target")).select(
            "doc_id", F.md5(F.encode("text", "UTF-8")).alias("_tgt_hash"))
        # batch twin: the same fixed-index suppression in one batch —
        # micro-batching cannot change the decision because survivors do
        # not join the index mid-stream (see streaming_corpus_ingest)
        twin_drop = (
            dedup.incremental_minhash_pairs(batch, sigs, threshold=0.3)
            .select(F.col("batch_id").alias("doc_id")).dropDuplicates()
            .select("doc_id", F.lit(True).alias("_twin_dropped"))
        )
        out = (
            batch.select(
                "doc_id", F.md5(F.encode("text", "UTF-8")).alias("text_hash"))
            .join(streamed, "doc_id", "left")
            .join(twin_drop, "doc_id", "left")
            .select(
                "doc_id", "text_hash",
                (F.col("_tgt_hash").isNotNull()
                 == F.col("_twin_dropped").isNull()).alias("stream_eq_batch"),
                F.coalesce(F.col("_tgt_hash") == F.col("text_hash"),
                           F.lit(True)).alias("target_text_ok"),
            )
        )
        # materialize off the temp dir so it can be removed before return
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_embeddings_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous SEMANTIC ingest, emitted as the same driver-checkable
    stream==batch invariant as ``documents_stream_ingest``: odd-vec_id
    embeddings stream in two micro-batches through foreachBatch, each
    hyperplane-bucketed against the PERSISTED even-vec_id embedding
    index (corpus side pre-partitioned on disk — only the batch
    shuffles); exact-cosine near-dups of the corpus at 0.7 are
    suppressed and survivors append. One row per streamed vector with
    its norm (SQL-recomputable), ``stream_eq_batch`` = the streamed
    keep/suppress decision equals the batch twin's
    (``incremental_embedding_pairs_indexed`` against the same fixed
    index — deterministic planes, so equality is exact), and
    ``target_vec_ok`` = kept vectors landed byte-identical (TRUE for
    suppressed). All flags TRUE by construction; the oracle asserts them
    (streaming/cube_stream.py::streaming_embedding_ingest)."""
    import os
    import shutil
    import tempfile

    from data_cube_spark.operators import similarity
    from data_cube_spark.streaming.cube_stream import (
        streaming_embedding_ingest,
    )

    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    corpus = emb.where(F.col("vec_id") % 2 == 0)
    batch = emb.where(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    work = tempfile.mkdtemp(prefix="sg_sembing_")
    tbl = os.path.basename(work).lower()
    try:
        similarity.write_embedding_index(
            corpus, tbl, n_buckets=8, path=os.path.join(work, "idx"))
        src = os.path.join(work, "src")
        half = batch.approxQuantile("vec_id", [0.5], 0.01)[0]
        batch.where(F.col("vec_id") <= half).coalesce(1) \
            .write.mode("overwrite").parquet(src)
        batch.where(F.col("vec_id") > half).coalesce(1) \
            .write.mode("append").parquet(src)
        q = streaming_embedding_ingest(
            spark, src, batch.schema, os.path.join(work, "ckpt"),
            os.path.join(work, "target"), index_table=tbl,
            threshold=0.7, max_files_per_trigger=1).start()
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("embeddings_stream_ingest: stream did not "
                               "finish within 300 s")
        streamed = spark.read.parquet(os.path.join(work, "target")).select(
            "vec_id", F.col("embedding").alias("_tgt_emb"))
        # batch twin: same fixed-index suppression in one batch — the
        # planes are deterministic functions of the stamped parameters,
        # so the micro-batched decisions must match exactly
        twin_drop = (
            similarity.incremental_embedding_pairs_indexed(
                batch, tbl, threshold=0.7)
            .select(F.col("batch_id").alias("vec_id")).dropDuplicates()
            .select("vec_id", F.lit(True).alias("_twin_dropped"))
        )
        out = (
            batch
            .join(streamed, "vec_id", "left")
            .join(twin_drop, "vec_id", "left")
            .select(
                "vec_id",
                similarity.norm(similarity._as_double(F.col("embedding")))
                .cast("double").alias("nrm"),
                (F.col("_tgt_emb").isNotNull()
                 == F.col("_twin_dropped").isNull()).alias("stream_eq_batch"),
                F.coalesce(F.col("_tgt_emb") == F.col("embedding"),
                           F.lit(True)).alias("target_vec_ok"),
            )
        )
        # materialize off the temp dir/tables so they can be dropped
        return out.localCheckpoint()
    finally:
        for s in ("buckets", "vec"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}_{s}")
        shutil.rmtree(work, ignore_errors=True)


def q_events_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once restoration: the events table is staged
    TWICE into a file-stream source (at-least-once redelivery), streaming
    ``dropDuplicates`` on event_id with watermark-bounded state removes
    the second delivery, and the appended parquet target aggregates back
    to the per-type totals of the ORIGINAL events — the oracle is plain
    batch GROUP BY over the single-copy table
    (streaming/cube_stream.py::streaming_dedup)."""
    import os
    import shutil
    import tempfile

    from data_cube_spark.streaming.cube_stream import streaming_dedup

    t = load_tables(spark, sf_dir)
    ev = t["events"]
    work = tempfile.mkdtemp(prefix="stream_dedup_")
    try:
        src = os.path.join(work, "src")
        ev.write.mode("overwrite").parquet(src)
        ev.write.mode("append").parquet(src)  # duplicate delivery
        q = streaming_dedup(spark, src, ev.schema, os.path.join(work, "ckpt"),
                            os.path.join(work, "target"),
                            id_cols=["event_id"]).start()
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("events_stream_dedup: stream did not finish "
                               "within 300 s")
        out = spark.read.parquet(os.path.join(work, "target"))
        return out.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            .alias("sum_value"),
        ).localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_events_stream_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full streaming loop as driver evidence (VERDICT r1 #10): events
    are staged into a file-stream source, the availableNow foreachBatch
    upsert maintains the materialized cube target, cube_from_materialized
    reopens it through the cube API, and the materialized
    (window_start, event_type) grain is returned. Oracle: plain batch
    GROUP BY over the same events — the stream==batch contract. Per-window
    sums are decimal-exact in the stream, so values hash-match."""
    import os
    import tempfile

    from data_cube_spark.streaming import cube_from_materialized, streaming_cube

    import shutil

    t = load_tables(spark, sf_dir)
    ev = t["events"]
    work = tempfile.mkdtemp(prefix="stream_cube_")
    try:
        src = os.path.join(work, "src")
        ev.write.mode("overwrite").parquet(src)
        q = streaming_cube(spark, src, ev.schema, os.path.join(work, "ckpt"),
                           os.path.join(work, "target"),
                           keys=["event_type"]).start()
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("events_stream_cube: stream did not finish "
                               "within 300 s")
        dc = cube_from_materialized(spark, os.path.join(work, "target"),
                                    keys=["event_type"])
        return dc.fact.df.select("window_start", "event_type", "n_events",
                                 "sum_value").localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _scd2_changelog_parts(spark: SparkSession, sf_dir: str):
    """Deterministic customer-segment change log (three waves), identical
    in both engines: every customer gets a v1 at 1994-01-01 (its raw
    segment); even custkeys change segment in 1998; custkeys divisible by
    3 change again in 2000."""
    cust = load_tables(spark, sf_dir)["customer"]
    v1 = cust.select(
        "c_custkey",
        F.lit("1994-01-01").cast("timestamp").alias("eff_ts"),
        F.col("c_mktsegment").alias("segment"),
    )
    v2 = cust.where(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        F.lit("1998-01-01").cast("timestamp").alias("eff_ts"),
        F.concat(F.col("c_mktsegment"), F.lit("-R2")).alias("segment"),
    )
    v3 = cust.where(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.lit("2000-01-01").cast("timestamp").alias("eff_ts"),
        F.concat(F.col("c_mktsegment"), F.lit("-R3")).alias("segment"),
    )
    return v1, v2, v3


def q_scd2_segment_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 version table from a change log
    (operators/scd.py::scd2_from_changelog): one lead-window pass
    partitioned by the natural key turns (key, ts, attrs) change rows
    into versions with half-open [valid_from, valid_to) intervals and an
    is_current flag. The reference's dimensions are static snapshots
    (R/dimension.R); this is the continuously-fed-warehouse treatment.
    Oracle: the same LEAD window in SQL."""
    from data_cube_spark.operators.scd import scd2_from_changelog

    v1, v2, v3 = _scd2_changelog_parts(spark, sf_dir)
    dim = scd2_from_changelog(v1.unionByName(v2).unionByName(v3),
                              "c_custkey", "eff_ts")
    return dim.select("c_custkey", "segment", "valid_from", "valid_to",
                      "is_current")


def q_scd2_temporal_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-SCD2 temporal join
    (operators/scd.py::scd2_temporal_join): each order joins the segment
    version valid AT ORDER TIME — the validity-interval predicate rides
    inside an equi-join on the customer key (hash join; intervals per key
    are disjoint, so no fan-out), revenue then aggregates by
    segment-as-of-then. Oracle: join with the interval predicate in SQL."""
    from data_cube_spark.operators.scd import (
        scd2_from_changelog,
        scd2_temporal_join,
    )

    v1, v2, v3 = _scd2_changelog_parts(spark, sf_dir)
    dim = scd2_from_changelog(v1.unionByName(v2).unionByName(v3),
                              "c_custkey", "eff_ts")
    orders = load_tables(spark, sf_dir)["orders"]
    j = scd2_temporal_join(orders, dim, "o_custkey", "c_custkey",
                           "o_orderdate", how="inner", broadcast_dim=True)
    return j.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
        .alias("sum_price"),
    )


def q_scd2_merge_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance as driver evidence
    (operators/scd.py::scd2_merge_changes): the dimension is built from
    the 1994 wave only, then the 1998+2000 change batch is MERGED in —
    touched keys (and only touched keys) rebuild through the lead window,
    untouched keys pass through an anti-join. The oracle is the full
    rebuild from the whole change log: a hash match proves
    merge(build(early), late) == build(early ∪ late)."""
    from data_cube_spark.operators.scd import (
        scd2_from_changelog,
        scd2_merge_changes,
    )

    v1, v2, v3 = _scd2_changelog_parts(spark, sf_dir)
    base = scd2_from_changelog(v1, "c_custkey", "eff_ts")
    merged = scd2_merge_changes(base, v2.unionByName(v3),
                                "c_custkey", "eff_ts")
    return merged.select("c_custkey", "segment", "valid_from", "valid_to",
                         "is_current")


def q_scd2_dim_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SCD2 dimension maintenance as driver evidence
    (streaming/cube_stream.py::streaming_scd2_dimension): the three
    change waves arrive as separate micro-batches (one file per trigger,
    availableNow); each
    batch merges into the standing version table via the verified batch
    operator, rewriting ONLY the hash buckets its keys touch (dynamic
    partition overwrite — O(touched buckets) per trigger, not
    O(dimension)). The oracle is the same LEAD-window SQL as the batch
    build: a hash match proves the streamed dimension is byte-equal to
    building from the full log at once."""
    import os
    import shutil
    import tempfile

    from data_cube_spark.streaming import streaming_scd2_dimension

    v1, v2, v3 = _scd2_changelog_parts(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="sg_scdstream_")
    src = os.path.join(base, "chg")
    target = os.path.join(base, "dim")
    try:
        for wave in (v1, v2, v3):
            wave.coalesce(1).write.mode("append").parquet(src)
        writer = streaming_scd2_dimension(
            spark, src, v1.schema, os.path.join(base, "ck"), target,
            key="c_custkey", ts_col="eff_ts", n_buckets=8,
            max_files_per_trigger=1)
        q = writer.start()
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("scd2 dimension stream did not finish in 300s")
        out = spark.read.parquet(target).select(
            "c_custkey", "segment", "valid_from", "valid_to", "is_current")
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_dual_index_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-epoch DUAL-index ingest as driver evidence (VERDICT r8 #5;
    streaming/cube_stream.py::streaming_dual_index_ingest): incoming
    documents — the odd half plus exact clones of every 10th corpus doc
    under fresh ids, which exercise the fingerprint stage — stream in
    two micro-batches; each runs exact-then-near-dup suppression against
    the PERSISTED fingerprint + minhash indexes, and the epoch's
    survivors maintain BOTH indexes, so batch 2 dedups against batch 1's
    survivors on both axes. Emitted per incoming doc: ``stream_eq_batch``
    = the streamed keep/suppress decision equals the SEQUENTIAL batch
    twin's (the same two-stage pipeline run inline, folding each wave's
    survivors into the hash/signature sets before the next); plus two
    set-level flags — after the nightly ``compact_all`` sweep the
    fingerprint and minhash index contents are row-equal to indexes
    REBUILT from corpus + survivors (exactly-once maintenance). All
    flags TRUE by construction; the oracle asserts them."""
    import os
    import shutil
    import tempfile
    import time as _time

    from data_cube_spark.operators.index_maintenance import compact_all
    from data_cube_spark.operators.text import fingerprint
    from data_cube_spark.streaming.cube_stream import (
        streaming_dual_index_ingest,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    corpus = docs.where(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    clones = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    odd = docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    half = odd.approxQuantile("doc_id", [0.5], 0.01)[0]
    wave1 = odd.where(F.col("doc_id") <= half)
    wave2 = odd.where(F.col("doc_id") > half).unionByName(clones)
    work = tempfile.mkdtemp(prefix="sg_dualidx_")
    tag = os.path.basename(work).lower()
    drops = [f"{tag}_{s}" for s in
             ("f_fp", "m_sig", "m_bands", "rf_fp", "rm_sig", "rm_bands")]
    try:
        dedup.write_fingerprint_index(
            corpus, f"{tag}_f", n_buckets=8, path=os.path.join(work, "fp"))
        dedup.write_minhash_index(
            corpus, f"{tag}_m", n_buckets=8, path=os.path.join(work, "mh"))
        src = os.path.join(work, "src")
        wave1.coalesce(1).write.mode("overwrite").parquet(src)
        _time.sleep(1.1)  # distinct mtimes pin the file-per-trigger order
        wave2.coalesce(1).write.mode("append").parquet(src)
        q = streaming_dual_index_ingest(
            spark, src, wave1.schema, os.path.join(work, "ck"),
            os.path.join(work, "target"), f"{tag}_f", f"{tag}_m",
            threshold=0.3, max_files_per_trigger=1).start()
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("dual_index_stream_ingest: stream did not "
                               "finish within 300 s")
        tgt = (spark.read.parquet(os.path.join(work, "target"))
               .select("doc_id", "text").localCheckpoint())
        streamed = tgt.select("doc_id", F.lit(True).alias("_streamed"))
        # SEQUENTIAL batch twin: same waves, same two stages, survivors
        # folded into the in-memory hash/signature sets between waves
        hashes = (corpus.select(fingerprint("text").alias("_fp"))
                  .dropDuplicates().localCheckpoint())
        sigs = dedup.minhash_signatures(corpus).localCheckpoint()
        twin_parts = []
        for wave in (wave1, wave2):
            ek = (wave.withColumn("_fp", fingerprint("text"))
                  .join(hashes, "_fp", "left_anti").drop("_fp"))
            dup = (dedup.incremental_minhash_pairs(ek, sigs, threshold=0.3)
                   .select(F.col("batch_id").alias("doc_id"))
                   .dropDuplicates())
            sv = ek.join(dup, "doc_id", "left_anti").localCheckpoint()
            twin_parts.append(sv)
            hashes = (hashes.unionByName(
                sv.select(fingerprint("text").alias("_fp")))
                .dropDuplicates().localCheckpoint())
            sigs = sigs.unionByName(
                dedup.minhash_signatures(sv)).localCheckpoint()
        twin = twin_parts[0].unionByName(twin_parts[1]).select(
            "doc_id", F.lit(True).alias("_twin"))
        # nightly sweep, then both indexes must equal rebuilt twins
        compact_all(spark, prefix=f"{tag}_")
        grown = corpus.unionByName(tgt)
        dedup.write_fingerprint_index(
            grown, f"{tag}_rf", n_buckets=8, path=os.path.join(work, "rf"))
        dedup.write_minhash_index(
            grown, f"{tag}_rm", n_buckets=8, path=os.path.join(work, "rm"))

        def _row_equal(a: str, b: str) -> bool:
            ta, tb = spark.table(a), spark.table(b)
            return (ta.exceptAll(tb).count() == 0
                    and tb.exceptAll(ta).count() == 0)

        fp_eq = _row_equal(f"{tag}_f_fp", f"{tag}_rf_fp")
        mh_eq = (_row_equal(f"{tag}_m_sig", f"{tag}_rm_sig")
                 and _row_equal(f"{tag}_m_bands", f"{tag}_rm_bands"))
        out = (
            odd.unionByName(clones)
            .join(streamed, "doc_id", "left")
            .join(twin, "doc_id", "left")
            .select(
                "doc_id",
                F.md5(F.encode("text", "UTF-8")).alias("text_hash"),
                (F.coalesce("_streamed", F.lit(False))
                 == F.coalesce("_twin", F.lit(False)))
                .alias("stream_eq_batch"),
                F.lit(bool(fp_eq)).alias("fp_eq_rebuild"),
                F.lit(bool(mh_eq)).alias("mh_eq_rebuild"),
            )
        )
        return out.localCheckpoint()
    finally:
        for t in drops:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(work, ignore_errors=True)


def q_prefix_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous EXACT-Jaccard ingest against the persisted prefix
    index (VERDICT r9 #4; streaming/cube_stream.py::
    streaming_prefix_ingest — pytest-proven since r9, now carrying
    driver evidence): odd-doc_id documents stream in two micro-batches;
    each is prefix-filtered against the even-doc
    :func:`...dedup.write_prefix_index` postings (corpus side read
    bucketed on the shingle key, only the batch shuffles), docs with an
    exact Jaccard >= 0.3 against the standing corpus are suppressed,
    and survivors fold into the index under its FROZEN shingle order —
    so batch 2 dedups against batch 1's survivors with zero recall loss
    (the append==rebuild exactness property, test_property.py). Emitted
    per odd doc: ``stream_eq_batch`` = the streamed keep/suppress
    decision equals the SEQUENTIAL batch twin's (the same exact R x S
    operator run inline, folding each wave's survivors into the corpus
    before the next — exactness makes the equality deterministic);
    ``sets_eq_rebuild`` = after the nightly ``compact_all`` sweep the
    appended ``_sets`` member is row-equal to an index REBUILT from
    corpus + survivors (the order-independent member; ``_prefix``
    posting lengths legitimately differ under a re-frozen order);
    ``consistency_ok`` = ``check_prefix_consistency`` sees exactly the
    grown corpus. All flags TRUE by construction; the oracle asserts
    them."""
    import os
    import shutil
    import tempfile
    import time as _time

    from data_cube_spark.operators.index_maintenance import compact_all
    from data_cube_spark.streaming.cube_stream import (
        streaming_prefix_ingest,
    )

    docs = load_tables(spark, sf_dir)["documents"]
    corpus = docs.where(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    odd = docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    half = odd.approxQuantile("doc_id", [0.5], 0.01)[0]
    wave1 = odd.where(F.col("doc_id") <= half)
    wave2 = odd.where(F.col("doc_id") > half)
    work = tempfile.mkdtemp(prefix="sg_pfxing_")
    tag = os.path.basename(work).lower()
    drops = [f"{tag}_{m}{s}" for m in ("p", "rp")
             for s in ("_prefix", "_df", "_sets")]
    try:
        dedup.write_prefix_index(
            corpus, f"{tag}_p", n_buckets=8, threshold=0.3,
            path=os.path.join(work, "idx"))
        src = os.path.join(work, "src")
        wave1.coalesce(1).write.mode("overwrite").parquet(src)
        _time.sleep(1.1)  # distinct mtimes pin the file-per-trigger order
        wave2.coalesce(1).write.mode("append").parquet(src)
        q = streaming_prefix_ingest(
            spark, src, wave1.schema, os.path.join(work, "ck"),
            os.path.join(work, "target"), f"{tag}_p",
            threshold=0.3, max_files_per_trigger=1).start()
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("prefix_stream_ingest: stream did not "
                               "finish within 300 s")
        tgt = (spark.read.parquet(os.path.join(work, "target"))
               .select("doc_id", "text").localCheckpoint())
        streamed = tgt.select("doc_id", F.lit(True).alias("_streamed"))
        # SEQUENTIAL batch twin: same waves through the inline exact
        # R x S operator, survivors folded into the corpus between waves
        cur = corpus
        twin_parts = []
        for wave in (wave1, wave2):
            dup = (dedup.jaccard_pairs_prefix_rs(wave, cur, threshold=0.3)
                   .select(F.col("batch_id").alias("doc_id"))
                   .dropDuplicates())
            sv = wave.join(dup, "doc_id", "left_anti").localCheckpoint()
            twin_parts.append(sv)
            cur = cur.unionByName(sv).localCheckpoint()
        twin = twin_parts[0].unionByName(twin_parts[1]).select(
            "doc_id", F.lit(True).alias("_twin"))
        # nightly sweep WITH re-freeze (r13, VERDICT r12 #5): the waves
        # nearly double the corpus, so the frozen shingle order's drift
        # (~0.94) crosses PREFIX_DF_DRIFT_BOUND — instead of the sweep
        # WARNING "pruning is degrading", refreeze_prefix acts on it:
        # the order and postings are re-frozen from the index's own
        # _sets member, counters reset, and the sweep reports the index
        # under "refrozen" with a clean bill of health.
        sweep = compact_all(spark, prefix=f"{tag}_p", refreeze_prefix=True)
        refrozen_ok = (f"{tag}_p" in sweep["refrozen"]
                       and not sweep["warnings"])
        grown = corpus.unionByName(tgt).localCheckpoint()
        dedup.write_prefix_index(
            grown, f"{tag}_rp", n_buckets=8, threshold=0.3,
            path=os.path.join(work, "ridx"))
        sa, sb = spark.table(f"{tag}_p_sets"), spark.table(f"{tag}_rp_sets")
        sets_eq = (sa.exceptAll(sb).count() == 0
                   and sb.exceptAll(sa).count() == 0)
        # the re-frozen order is derived from the same grown corpus the
        # rebuild shingles from scratch, so the POSTINGS (including the
        # _pos ranks the PPJoin pruning reads) must be identical
        pa, pb = (spark.table(f"{tag}_p_prefix"),
                  spark.table(f"{tag}_rp_prefix"))
        prefix_eq = (pa.exceptAll(pb).count() == 0
                     and pb.exceptAll(pa).count() == 0)
        n_ok = (dedup.check_prefix_consistency(spark, f"{tag}_p")
                == grown.count())
        out = (
            odd.join(streamed, "doc_id", "left")
            .join(twin, "doc_id", "left")
            .select(
                "doc_id",
                F.md5(F.encode("text", "UTF-8")).alias("text_hash"),
                (F.coalesce("_streamed", F.lit(False))
                 == F.coalesce("_twin", F.lit(False)))
                .alias("stream_eq_batch"),
                F.lit(bool(sets_eq)).alias("sets_eq_rebuild"),
                F.lit(bool(n_ok)).alias("consistency_ok"),
                F.lit(bool(refrozen_ok and prefix_eq))
                .alias("refrozen_eq_rebuild"),
            )
        )
        return out.localCheckpoint()
    finally:
        for t in drops:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(work, ignore_errors=True)


def q_stream_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful stream-stream interval join
    (streaming/stream_join.py::interval_attribution_join): purchases
    attributed to same-user views within 30 minutes, BOTH sides real
    file streams with watermarks — the time bound in the join condition
    is what lets Spark's state store evict (bounded state; an
    unbounded-history stream join is inexpressible here by design).
    Inner stream-stream joins emit eagerly, so the availableNow run
    produces every pair; the oracle is the batch inequality join in SQL
    — a hash match proves stream == batch. Stream==batch also pinned at
    the operator level by
    tests/test_streaming.py::test_stream_stream_attribution_join_equals_batch."""
    import os
    import shutil
    import tempfile
    import uuid

    from data_cube_spark.streaming.stream_join import (
        interval_attribution_join,
    )

    ev = load_tables(spark, sf_dir)["events"]
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"))
    buys = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("buy_ts"),
        F.col("event_id").alias("buy_id"), "value")
    base = tempfile.mkdtemp(prefix="sg_ssj_")
    vdir, bdir = os.path.join(base, "views"), os.path.join(base, "buys")
    qname = f"ssj_{uuid.uuid4().hex[:8]}"
    try:
        views.write.parquet(vdir)
        buys.write.parquet(bdir)
        vs = spark.readStream.schema(views.schema).parquet(vdir)
        bs = spark.readStream.schema(buys.schema).parquet(bdir)
        joined = interval_attribution_join(
            vs, bs, "user_id", "view_ts", "buy_ts", within="30 minutes")
        q = (joined.writeStream.format("memory").queryName(qname)
             .outputMode("append").trigger(availableNow=True)
             .option("checkpointLocation", os.path.join(base, "ck"))
             .start())
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("attribution stream did not finish in 300s")
        out = spark.table(qname).select("user_id", "view_id", "buy_id",
                                        "value")
        return out.localCheckpoint()
    finally:
        spark.catalog.dropTempView(qname)
        shutil.rmtree(base, ignore_errors=True)
