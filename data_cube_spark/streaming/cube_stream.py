"""Structured Streaming cube maintenance.

The reference is purely batch (SURVEY.md §2.8) — this module is greenfield
Spark design: the same cube aggregations expressed over ``readStream``
sources with watermarked event-time windows, plus a ``foreachBatch``
incremental-upsert maintainer for a materialized cube.

Every function here also works on a *batch* DataFrame (Spark's unified
API) — the batch variants are what the DuckDB oracle checks; the streaming
tests run the identical expressions through ``readStream`` +
``trigger(availableNow=True)`` and assert equal results. That equivalence
IS the correctness argument for the streaming path.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_cube_spark.functions import dec, epoch_seconds


def _ltz(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks (and streaming state timers) require TIMESTAMP, not
    TIMESTAMP_NTZ — parquet written with ``isAdjustedToUTC=false`` reads
    back as NTZ. Cast is a no-op for regular timestamps; for NTZ the wall
    clock is interpreted in the session timezone (UTC, session.py)."""
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp_ltz"))
    return df


def tumbling_agg(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window aggregate: (window_start, *keys) -> count + exact sum.

    On a stream the watermark bounds state: late rows beyond ``watermark``
    are dropped and windows finalize. On a batch frame the same expression
    is a plain group-by. Decimal sums keep results shuffle-order exact."""
    df = _ltz(events, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    keys = keys or []
    out = df.groupBy(F.window(ts_col, window).alias("w"), *keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value", 18, 6)).cast("double").alias("sum_value"),
    )
    return out.select(
        F.col("w.start").alias("window_start"), *keys, "n_events", "sum_value"
    )


def session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user via the built-in ``session_window`` (gap
    merge is handled by Spark's stateful operator on streams)."""
    df = _ltz(events, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(F.session_window(ts_col, gap).alias("w"), user_col).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return out.select(
        F.col(user_col), F.col("w.start").alias("session_start"), "n_events"
    )


def sessionize_batch(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Batch sessionization via gaps-and-islands (lag + running count) —
    the SQL-expressible twin of :func:`session_windows`, used as its oracle.
    One shuffle on the user key; the window sort is per-user."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.lag(ts_col).over(w)
    new_session = (
        F.when(gap.isNull(), 1)
        .when(epoch_seconds(ts_col) - epoch_seconds(gap) > gap_minutes * 60, 1)
        .otherwise(0)
    )
    sess = events.withColumn("_new", new_session).withColumn(
        "_sid", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy(user_col, "_sid").agg(
        F.min(ts_col).alias("session_start"), F.count(F.lit(1)).alias("n_events")
    ).drop("_sid")


def stateful_user_totals(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    watermark: str = "2 hours",
):
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running (n_events, sum_value) maintained across micro-batches.

    This is the extension point Spark gives for operators its built-in
    stateful aggregations can't express (arbitrary per-key state machines).
    State is one (n, s) pair per user — O(distinct users) across the
    cluster, partitioned by the grouping key. Each batch emits the keys it
    touched (update semantics).

    Batch twin (the oracle): ``events.groupBy(user).agg(count, sum)`` —
    the streaming final state must equal it, which the tests assert."""
    import pandas as pd

    df = _ltz(events, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)

    def update(key, pdf_iter, state):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            s += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame({
            "user_id": [key[0]], "n_events": [n], "sum_value": [s],
        })

    return df.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, sum_value double",
        stateStructType="n bigint, s double",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def stateful_sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str = "2 hours",
):
    """Custom sessionization state machine via ``applyInPandasWithState``
    — the hand-rolled twin of the built-in ``session_window``, for session
    semantics Spark's operator can't express (custom close conditions,
    per-session payloads, side outputs).

    State per user: (open-session start, last event time, count) as epoch
    micros. Each batch folds its (sorted) events into the state, emitting
    one row per session it touched: ``closed=true`` rows are final;
    the trailing ``closed=false`` row is the open session's running
    snapshot (update semantics — the last emission per (user,
    session_start) is the session summary).

    Ordering contract: events for a key must arrive in non-decreasing
    event-time order ACROSS batches (within a batch they are sorted here).
    On a real deployment that is the watermark+sorted-source contract; the
    tests feed time-range-split files in order."""
    import pandas as pd

    gap_us = int(gap_minutes) * 60 * 1_000_000
    df = _ltz(events, ts_col)
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)

    def update(key, pdf_iter, state):
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = None, None, 0
        sessions = []
        pdfs = [p for p in pdf_iter if len(p)]
        rows = pd.concat(pdfs).sort_values(ts_col) if pdfs else None
        if rows is not None:
            for t in rows[ts_col]:
                t_us = t.value // 1000
                if last_us is not None and t_us - last_us > gap_us:
                    sessions.append((start_us, n, True))
                    start_us, n = None, 0
                if start_us is None:
                    start_us = t_us
                n += 1
                last_us = t_us
        state.update((start_us, last_us, n))
        sessions.append((start_us, n, False))
        yield pd.DataFrame({
            "user_id": [key[0]] * len(sessions),
            "session_start": [pd.Timestamp(s * 1000) for s, _, _ in sessions],
            "n_events": [int(c) for _, c, _ in sessions],
            "closed": [bool(cl) for _, _, cl in sessions],
        })

    return df.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=(
            "user_id bigint, session_start timestamp, n_events bigint, "
            "closed boolean"
        ),
        stateStructType="start bigint, last bigint, n bigint",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def user_totals_batch(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Batch twin of :func:`stateful_user_totals` (its differential oracle)."""
    return events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(value_col).cast("double").alias("sum_value"),
    )


def cube_from_materialized(
    spark: SparkSession,
    target_dir: str,
    keys: list[str],
):
    """Open the parquet target maintained by :func:`streaming_cube` as a
    queryable :class:`DataCube`: fact at (window_start, *keys) grain with
    sum-reaggregable measures, flat dimensions per key plus the window
    dimension. This closes the loop — the stream maintains the cube, the
    cube API queries it (further rollups/dices run on pre-aggregated
    partials, never the raw event history)."""
    from data_cube_spark.model import DataCube, Dimension, Fact, Measure

    df = spark.read.parquet(target_dir).drop("window_key")
    id_vars = ["window_start", *keys]
    measures = {
        "n_events": Measure("n_events", agg="sum"),
        "sum_value": Measure("sum_value", agg="sum"),
    }
    fact = Fact(df, id_vars, measures)
    dims = {"window": Dimension("window", "window_start",
                                df.select("window_start").dropDuplicates())}
    for k in keys:
        dims[k] = Dimension(k, k, df.select(k).dropDuplicates())
    return DataCube(fact, dims)


def streaming_cube(
    spark: SparkSession,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    target_dir: str,
    keys: list[str],
    ts_col: str = "ts",
    window: str = "1 hour",
):
    """Maintain a materialized cube over a parquet-file stream with
    ``foreachBatch`` incremental upsert.

    Upsert correctness under UPDATE output mode: a micro-batch emits only
    the ``(window, key)`` rows it TOUCHED (with their cumulative state
    values) — not every row of every touched window, and not untouched
    windows at all. A naive partition overwrite therefore silently deletes
    (a) previously materialized windows sharing a coarser partition value,
    and (b) keys of a touched window absent from this batch. Two measures
    fix both:

    - the sink is partitioned by ``window_key`` (epoch seconds of the
      window start — a long survives the partition-directory round trip
      that a timestamp would not), so the dynamic-overwrite unit is exactly
      one window and untouched windows are never rewritten;
    - within touched windows, rows for keys NOT in the batch are read back
      from the target, materialized via ``localCheckpoint`` (the read must
      complete before the overwrite job deletes the files), and unioned
      with the batch rows — classic read-merge-write.

    Replays of an epoch re-emit the same cumulative rows, so the merge is
    idempotent. At scale the target would be a transactional table
    (Delta/Iceberg MERGE doing the same thing under snapshot isolation);
    vanilla parquet needs it spelled out.
    """
    stream = _ltz(
        spark.readStream.schema(schema).format("parquet").load(source_dir),
        ts_col,
    )
    agg = tumbling_agg(stream, ts_col=ts_col, window=window, keys=keys)
    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(make_window_upsert(spark, target_dir, keys))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def _read_target(spark: SparkSession, path: str) -> DataFrame | None:
    """Open a parquet target maintained by a foreachBatch upsert, or return
    ``None`` when the target PROVABLY holds no data yet (first batch): the
    path does not exist (``PATH_NOT_FOUND``) or exists without a readable
    footer — a first write that crashed pre-commit
    (``UNABLE_TO_INFER_SCHEMA``). Every other failure — a corrupt footer,
    a transient filesystem error, a failed job — propagates, so the
    micro-batch FAILS and foreachBatch replays it; swallowing it would
    dynamic-overwrite the touched partitions with batch-only state,
    silently dropping previously merged rows. Connect-safe: classifies
    analyzer error classes instead of probing the Hadoop FileSystem
    through py4j internals (ADVICE r5)."""
    try:
        return spark.read.parquet(path)
    except AnalysisException as ex:
        marker = (ex.getErrorClass() or "") + str(ex)
        if "PATH_NOT_FOUND" in marker or "UNABLE_TO_INFER_SCHEMA" in marker:
            return None
        raise


def make_window_upsert(spark: SparkSession, target_dir: str, keys: list[str]):
    """Build the read-merge-write upsert used by :func:`streaming_cube`
    (documented there). Exposed so callers with their own source wiring
    (e.g. maxFilesPerTrigger tuning) reuse the exact same merge logic."""

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        b = batch_df.withColumn(
            "window_key", F.col("window_start").cast("long")
        ).persist()
        touched = [r[0] for r in b.select("window_key").distinct().collect()]
        if not touched:
            b.unpersist()
            return
        out = b
        # Only a provably absent/empty target skips the read-merge (first
        # batch); any other read failure propagates and fails the
        # micro-batch — same contract as streaming_scd2_dimension.
        existing_all = _read_target(spark, target_dir)
        if existing_all is not None:
            existing = existing_all.where(F.col("window_key").isin(touched))
            keep = existing.join(
                b.select("window_key", *keys).dropDuplicates(),
                ["window_key", *keys], "left_anti",
            ).localCheckpoint()  # eager: files are read before the overwrite
            out = b.unionByName(keep)
        (
            out.repartition("window_key")
            .write.mode("overwrite")
            .partitionBy("window_key")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(target_dir)
        )
        b.unpersist()

    return upsert


def streaming_corpus_ingest(
    spark: SparkSession,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    target_dir: str,
    corpus_signatures=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    max_files_per_trigger: int | None = None,
    index_table: str | None = None,
    append_survivors: bool = False,
):
    """Continuous corpus ingest with near-dup suppression: every
    micro-batch of incoming documents is MinHash-banded against the
    standing corpus signature index
    (:func:`...dedup.incremental_minhash_pairs`) and only the survivors
    append to the target — the streaming twin of the batch
    ``incremental_dedup_keep``.

    The index is either an in-session signature frame
    (``corpus_signatures``) or — the production shape — a PERSISTED
    bucketed index (``index_table``, written once by
    :func:`...dedup.write_minhash_index`): then each micro-batch's
    candidate join reads the corpus side pre-partitioned on the band key
    and only the micro-batch shuffles.

    ``foreachBatch`` is the idiomatic shape: signature building is a
    per-document aggregation, which append-mode streaming cannot express
    directly, but inside foreachBatch each micro-batch is a full batch
    DataFrame, so the verified batch operators run unchanged per
    trigger. The corpus index is read once per batch (in production a
    persisted/bucketed table); survivors of earlier batches do NOT join
    the index mid-stream — same-run duplicates are handled by the
    standing index refresh cadence, exactly like a daily-compaction
    production pipeline.

    Exactly-once under crash/restart: survivors land in an
    epoch-keyed partition directory (``ingest_epoch=<id>``) written with
    OVERWRITE. foreachBatch is at-least-once — a batch that crashed
    mid-write is REPLAYED with the same epoch id on restart — so a plain
    append would duplicate its rows; overwriting the epoch's own
    directory makes the replay idempotent (the vanilla-parquet version
    of what a Delta/Iceberg transactional MERGE gives you). Readers scan
    the target root; the extra ``ingest_epoch`` partition column is
    harmless metadata.

    ``append_survivors=True`` (requires ``index_table``) makes the index
    SELF-MAINTAINING: each micro-batch's survivors are folded into the
    persisted index via ``append_to_minhash_index``, so LATER batches in
    the same run dedup against them too — the within-run duplicate
    window shrinks from the refresh cadence to a single micro-batch
    (only same-batch near-dups remain until compaction). Replay-safe:
    candidate pairs whose ``corpus_id`` is among THIS EPOCH's previously
    written survivors (read back from the epoch's own target directory —
    the durable record of what a crashed earlier attempt already folded
    into the index) are excluded, so a replayed batch recomputes the
    IDENTICAL survivor set and overwrites its epoch directory
    idempotently. Scoping the exclusion to the epoch's own rows — not
    the whole batch id set — means a re-delivered document whose STABLE
    id already exists in the standing corpus index (e.g. a re-crawl) is
    still suppressed against the original corpus row (ADVICE r6); the
    re-run index append only duplicates rows, which is harmless for the
    anti-join semantics and cleaned by ``compact_minhash_index`` on the
    refresh cadence. (Corollary: a brand-new checkpoint must point at a
    brand-new target dir — stale same-numbered epoch directories from an
    abandoned run would be misread as this run's own appends.)"""
    import os

    from data_cube_spark.operators.dedup import (
        append_to_minhash_index,
        incremental_minhash_pairs,
        incremental_minhash_pairs_indexed,
    )

    if (corpus_signatures is None) == (index_table is None):
        raise ValueError(
            "pass exactly one of corpus_signatures / index_table")
    if append_survivors and index_table is None:
        raise ValueError("append_survivors requires index_table")

    def ingest(batch_df, epoch_id: int) -> None:
        if not batch_df.columns:
            return
        if index_table is not None:
            pairs = incremental_minhash_pairs_indexed(
                batch_df, index_table, text_col=text_col,
                id_col=id_col, threshold=threshold)
            if append_survivors:
                # replay-idempotence filter (scope per ADVICE r6): exclude
                # matches against exactly the rows a crashed earlier
                # attempt of THIS epoch already appended — its survivors,
                # read back from the epoch's own target directory. A
                # batch id that also exists in the PRE-EXISTING corpus
                # (stable-id re-crawl) is not excluded, so its genuine
                # suppression still fires. Eager checkpoint: the id set
                # must be materialized before this epoch's directory is
                # overwritten below.
                prev = _read_target(spark, os.path.join(
                    target_dir, f"ingest_epoch={int(epoch_id)}"))
                if prev is not None:
                    own = (prev.select(F.col(id_col).alias("corpus_id"))
                           .dropDuplicates().localCheckpoint())
                    pairs = pairs.join(own, "corpus_id", "left_anti")
        else:
            pairs = incremental_minhash_pairs(
                batch_df, corpus_signatures, text_col=text_col,
                id_col=id_col, threshold=threshold)
        dup = pairs.select(F.col("batch_id").alias(id_col)).dropDuplicates()
        survivors = batch_df.join(dup, id_col, "left_anti")
        if append_survivors:
            # one materialization feeds both the epoch write and the
            # index append (avoids recomputing the banded join)
            survivors = survivors.localCheckpoint()
        (survivors.write.mode("overwrite")
         .parquet(os.path.join(target_dir, f"ingest_epoch={int(epoch_id)}")))
        if append_survivors:
            append_to_minhash_index(
                survivors.select(id_col, text_col), index_table,
                text_col=text_col, id_col=id_col)

    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(source_dir)
    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def streaming_embedding_ingest(
    spark: SparkSession,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    target_dir: str,
    index_table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.85,
    n_planes: int | None = None,
    n_tables: int | None = None,
    dim: int | None = None,
    seed: int | None = None,
    max_files_per_trigger: int | None = None,
    append_survivors: bool = False,
):
    """Continuous SEMANTIC ingest — the embedding twin of
    :func:`streaming_corpus_ingest`: every micro-batch of incoming
    vectors is hyperplane-bucketed against the PERSISTED embedding index
    (:func:`...similarity.write_embedding_index`), candidates are
    exact-cosine verified, and only vectors with no standing near-dup at
    ``threshold`` append to the target. Per micro-batch only the batch
    is bucketed and shuffled — the corpus bucket/vector tables come off
    disk pre-partitioned on their join keys.

    Same exactly-once contract as the text path: survivors land in an
    epoch-keyed partition directory written with OVERWRITE, so an
    at-least-once foreachBatch replay is idempotent.

    ``append_survivors=True`` makes the index self-maintaining via
    ``append_to_embedding_index`` — later batches in the same run dedup
    against earlier survivors. Replay-safe by the same argument as the
    text path: candidate pairs whose ``corpus_id`` is among THIS epoch's
    previously written survivors (read back from the epoch's target
    directory) are excluded, so a replayed batch recomputes the
    identical survivor set — while a stable-id re-delivery is still
    suppressed against its pre-existing corpus row (ADVICE r6); the
    re-run index append only duplicates rows (harmless for the
    anti-join, cleaned by ``compact_embedding_index`` on the refresh
    cadence). The plane geometry comes from the index
    metadata per batch; explicitly-passed parameters are validated there
    — a mismatch fails the stream rather than silently losing every
    candidate."""
    import os

    from data_cube_spark.operators.similarity import (
        append_to_embedding_index,
        incremental_embedding_pairs_indexed,
    )

    params = dict(n_planes=n_planes, n_tables=n_tables, dim=dim, seed=seed)

    def ingest(batch_df, epoch_id: int) -> None:
        if not batch_df.columns:
            return
        pairs = incremental_embedding_pairs_indexed(
            batch_df, index_table, threshold=threshold,
            id_col=id_col, vec_col=vec_col, **params)
        if append_survivors:
            # replay-idempotence filter scoped to THIS epoch's previously
            # written survivors (read back from its target directory) —
            # not the whole batch id set, so a stable-id re-delivery is
            # still suppressed against the pre-existing corpus row
            # (ADVICE r6; rationale in streaming_corpus_ingest). Eager
            # checkpoint before the epoch directory is overwritten.
            prev = _read_target(spark, os.path.join(
                target_dir, f"ingest_epoch={int(epoch_id)}"))
            if prev is not None:
                own = (prev.select(F.col(id_col).alias("corpus_id"))
                       .dropDuplicates().localCheckpoint())
                pairs = pairs.join(own, "corpus_id", "left_anti")
        dup = pairs.select(F.col("batch_id").alias(id_col)).dropDuplicates()
        survivors = batch_df.join(dup, id_col, "left_anti")
        if append_survivors:
            # one materialization feeds both the epoch write and the
            # index append (avoids recomputing the candidate join)
            survivors = survivors.localCheckpoint()
        (survivors.write.mode("overwrite")
         .parquet(os.path.join(target_dir, f"ingest_epoch={int(epoch_id)}")))
        if append_survivors:
            append_to_embedding_index(
                survivors.select(id_col, vec_col), index_table,
                id_col=id_col, vec_col=vec_col, **params)

    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(source_dir)
    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def streaming_dual_index_ingest(
    spark: SparkSession,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    target_dir: str,
    fp_table: str,
    mh_table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    max_files_per_trigger: int | None = None,
):
    """Single-epoch DUAL-index ingest (VERDICT r7 #7 / r8 #5): one
    ``foreachBatch`` epoch runs the full two-stage dedup — exact
    fingerprint anti-join first, MinHash-LSH near-dup suppression on
    what survives it — and the epoch's survivors maintain BOTH persisted
    indexes (:func:`...dedup.write_fingerprint_index` and
    :func:`...dedup.write_minhash_index`), so later micro-batches in the
    same run dedup against earlier survivors on both axes. Per batch
    only the batch is hashed/shingled/shuffled; both corpus index sides
    come off disk pre-partitioned on their join keys.

    Exactly-once for the TARGET, idempotent-after-compaction for the
    indexes: survivors land in an epoch-keyed directory written with
    OVERWRITE (at-least-once replays rewrite it byte-identically), and a
    replayed epoch recomputes the IDENTICAL survivor set despite its own
    rows being indexed by the crashed attempt —

    - exact path: the crashed attempt's own contributions are exactly
      the fingerprints of THIS epoch's previously written survivors
      (read back from the epoch's own target directory), and none of
      those hashes can also pre-exist in the index (a doc whose hash
      pre-existed was suppressed, hence never a survivor) — so
      subtracting them from the index side restores the pre-crash view
      precisely;
    - near-dup path: candidate pairs whose ``corpus_id`` is among this
      epoch's own survivors are excluded, the same ADVICE-r6 scoping as
      :func:`streaming_corpus_ingest` (a stable-id re-delivery is still
      suppressed against its pre-existing corpus row).

    A crash BETWEEN the two index appends re-appends both on replay —
    duplicate rows, harmless for anti-join semantics, re-distincted by
    the nightly :func:`...index_maintenance.compact_all` sweep (the
    kill-and-resume test proves both indexes equal their batch-rebuilt
    twins after compaction). All index parameters come from the stamped
    metadata — a caller cannot drift from the writers'."""
    import os

    from data_cube_spark.operators.dedup import (
        _index_meta,
        append_to_fingerprint_index,
        append_to_minhash_index,
        fingerprint,
        incremental_minhash_pairs_indexed,
    )

    fp_meta = _index_meta(spark, f"{fp_table}_fp")
    mh_meta = _index_meta(spark, f"{mh_table}_sig")
    if not fp_meta or not mh_meta:
        raise ValueError(
            f"{fp_table}_fp / {mh_table}_sig must be written by "
            f"write_fingerprint_index / write_minhash_index first")
    canonical = fp_meta.get("canonical") == "True"
    mh_params = {"num_hashes": int(mh_meta["num_hashes"]),
                 "bands": int(mh_meta["bands"]), "k": int(mh_meta["k"])}

    def _hash(col):
        return (fingerprint(col) if canonical
                else F.md5(F.encode(F.col(col), "UTF-8")))

    def ingest(batch_df, epoch_id: int) -> None:
        if not batch_df.columns:
            return
        # all catalog reads go through the micro-batch session (a fresh
        # clone per trigger, so it always lists the files earlier
        # triggers appended); reading via the OUTER session would pin a
        # stale file-index cache from batch 0 onward
        s = batch_df.sparkSession
        prev = _read_target(spark, os.path.join(
            target_dir, f"ingest_epoch={int(epoch_id)}"))
        # stage 1 — exact: anti-join on content hash against the
        # fingerprint index MINUS this epoch's own prior contributions
        # (eagerly materialized before the epoch dir is overwritten)
        hashed = batch_df.withColumn("_fp", _hash(text_col))
        idx = s.table(f"{fp_table}_fp").select(
            F.col("content_hash").alias("_fp"))
        own = None
        if prev is not None:
            own = prev.localCheckpoint()
            idx = idx.join(own.select(_hash(text_col).alias("_fp"))
                           .dropDuplicates(), "_fp", "left_anti")
        exact_keep = hashed.join(idx, "_fp", "left_anti").drop("_fp")
        # stage 2 — near-dup: band what survived stage 1 against the
        # minhash index, excluding matches on this epoch's own survivors
        pairs = incremental_minhash_pairs_indexed(
            exact_keep, mh_table, text_col=text_col, id_col=id_col,
            threshold=threshold, **mh_params)
        if own is not None:
            pairs = pairs.join(
                own.select(F.col(id_col).alias("corpus_id"))
                .dropDuplicates(), "corpus_id", "left_anti")
        dup = pairs.select(F.col("batch_id").alias(id_col)).dropDuplicates()
        # one materialization feeds the epoch write and BOTH index appends
        survivors = exact_keep.join(dup, id_col, "left_anti").localCheckpoint()
        (survivors.write.mode("overwrite")
         .parquet(os.path.join(target_dir, f"ingest_epoch={int(epoch_id)}")))
        folded = survivors.select(id_col, text_col)
        append_to_fingerprint_index(folded, fp_table, text_col=text_col,
                                    canonical=canonical)
        append_to_minhash_index(folded, mh_table, text_col=text_col,
                                id_col=id_col, **mh_params)
        # the insertIntos above ran in the micro-batch session clone —
        # invalidate the DRIVER session's cached file indexes so readers
        # on it (the caller, the nightly compact sweep) see the appends
        for t in (f"{fp_table}_fp", f"{mh_table}_sig", f"{mh_table}_bands"):
            spark.catalog.refreshTable(t)

    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(source_dir)
    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def streaming_prefix_ingest(
    spark: SparkSession,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    target_dir: str,
    index_table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float | None = None,
    max_files_per_trigger: int | None = None,
):
    """Continuous EXACT-Jaccard ingest — the prefix-index twin of
    :func:`streaming_corpus_ingest`, composing the r9 O(batch)
    :func:`...dedup.append_prefix_index`: every micro-batch is
    prefix-filtered against the persisted
    :func:`...dedup.write_prefix_index` postings (corpus side read
    bucketed on the shingle key, only the batch shuffles), documents
    with an exact Jaccard >= ``threshold`` against the standing corpus
    are suppressed, and survivors are folded into the index under its
    FROZEN shingle order — so later batches dedup against earlier
    survivors with zero recall loss (exactness never depends on the
    order being fresh; only pruning efficiency drifts, which the
    stamped counters track and ``list_indexes`` surfaces).

    ``threshold`` defaults to the index's stored threshold and must be
    >= it (enforced by the read path — shorter stored prefixes would
    silently lose recall). Same exactly-once contract as the family:
    epoch-keyed OVERWRITE target; replayed epochs exclude candidate
    pairs on their own previously written survivors, so the survivor
    set recomputes identically; re-run appends only duplicate
    posting/set rows, re-distincted by ``compact_prefix_index`` on the
    nightly sweep (a crash between the two member inserts is caught
    fail-loudly by ``check_prefix_consistency`` there). One honest
    caveat: a replayed append re-accumulates the DRIFT counters, so
    after a crash they over-count corpus growth — conservative (flags
    a rebuild earlier, never later) and re-zeroed by the rebuild that
    re-freezes the order."""
    import os

    from data_cube_spark.operators.dedup import (
        _require_index_meta,
        append_prefix_index,
        incremental_prefix_pairs_indexed,
    )

    stored = _require_index_meta(spark, f"{index_table}_prefix", {})
    k = int(stored["k"])
    hashed = stored["hash_shingles"] == "True"
    t = float(stored["threshold"]) if threshold is None else threshold

    def ingest(batch_df, epoch_id: int) -> None:
        if not batch_df.columns:
            return
        pairs = incremental_prefix_pairs_indexed(
            batch_df, index_table, text_col=text_col, id_col=id_col,
            k=k, threshold=t, hash_shingles=hashed)
        prev = _read_target(spark, os.path.join(
            target_dir, f"ingest_epoch={int(epoch_id)}"))
        if prev is not None:
            own = (prev.select(F.col(id_col).alias("corpus_id"))
                   .dropDuplicates().localCheckpoint())
            pairs = pairs.join(own, "corpus_id", "left_anti")
        dup = pairs.select(F.col("batch_id").alias(id_col)).dropDuplicates()
        survivors = batch_df.join(dup, id_col, "left_anti").localCheckpoint()
        (survivors.write.mode("overwrite")
         .parquet(os.path.join(target_dir, f"ingest_epoch={int(epoch_id)}")))
        append_prefix_index(survivors.select(id_col, text_col),
                            index_table, text_col=text_col, id_col=id_col)
        # insertIntos ran in the micro-batch session clone — refresh the
        # driver session's cached file indexes (see dual-index ingest)
        for suf in ("_prefix", "_df", "_sets"):
            spark.catalog.refreshTable(f"{index_table}{suf}")

    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(source_dir)
    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def streaming_ann_serving(
    spark: SparkSession,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    target_dir: str,
    index_table: str,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    max_files_per_trigger: int | None = None,
):
    """ANN-as-a-service: a stream of query vectors answered against the
    PERSISTED IVF index (:func:`...similarity.write_ivf_index`) — the
    serving loop the persisted-index architecture exists for. Each
    micro-batch of queries runs :func:`...similarity.ann_ivf_topk_indexed`
    unchanged: centroids broadcast off the tiny table, every query probes
    its ``n_probe`` nearest cells, and the candidate equi-join reads the
    cells table bucketed on ``cell_id`` — per trigger only the query
    batch shuffles, the standing corpus never does.

    Results land in an epoch-keyed directory (``serve_epoch=<id>``)
    written with OVERWRITE — the same exactly-once-under-replay contract
    as the ingest streams (foreachBatch is at-least-once; the stored
    centroids are fixed, so a replayed batch recomputes bit-identical
    top-k rows and the overwrite is idempotent). Maintenance goes
    through the index's own cadence (append / compact / retrain via
    ``write_ivf_index``) without touching the serving query.

    Greenfield vs the reference (SURVEY §2.10): data.cube has no
    streaming or similarity surface; this closes the loop on the
    "ANN service" framing of the persisted IVF index (VERDICT r6 #8)."""
    import os

    from data_cube_spark.operators.similarity import ann_ivf_topk_indexed

    def serve(batch_df, epoch_id: int) -> None:
        if not batch_df.columns:
            return
        res = ann_ivf_topk_indexed(
            batch_df, index_table, k=k, n_probe=n_probe, id_col=id_col,
            vec_col=vec_col, exclude_self=exclude_self)
        (res.write.mode("overwrite")
         .parquet(os.path.join(target_dir, f"serve_epoch={int(epoch_id)}")))

    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        reader.load(source_dir).writeStream.outputMode("append")
        .foreachBatch(serve)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def streaming_dedup(
    spark: SparkSession,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    target_dir: str,
    id_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "24 hours",
    max_files_per_trigger: int | None = None,
):
    """Exactly-once restoration over an at-least-once stream: drop
    duplicate deliveries by ``id_cols`` with watermark-bounded state.
    ``max_files_per_trigger`` throttles micro-batch size (and lets tests
    force redeliveries into LATER batches — state must carry across).

    ``dropDuplicates`` keys streaming state by the id columns; the
    watermark on ``ts_col`` lets Spark evict state older than the
    watermark delay, so state size is bounded by the duplicate-arrival
    horizon (a redelivery later than ``watermark`` would survive — size
    the delay to the delivery SLA, e.g. a Kafka retention window).
    Deduplicated rows append to a parquet target: append mode means each
    unique row is emitted exactly once, on first sight."""
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = _ltz(reader.load(source_dir), ts_col)
    deduped = stream.withWatermark(ts_col, watermark).dropDuplicates(id_cols)
    return (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", target_dir)
    )


def streaming_scd2_dimension(
    spark: SparkSession,
    source_dir: str,
    schema,
    checkpoint_dir: str,
    target_dir: str,
    key,
    ts_col: str,
    n_buckets: int = 64,
    max_files_per_trigger: int | None = None,
):
    """Maintain an SCD Type-2 dimension from a STREAM of change rows —
    the continuously-fed twin of ``operators.scd.scd2_merge_changes``.

    Each micro-batch merges into the standing version table via the
    verified batch operator (foreachBatch, same rationale as
    :func:`streaming_corpus_ingest`: per-group rebuild is not
    append-mode-expressible, but inside foreachBatch the batch operator
    runs unchanged). The target is partitioned by a stable hash bucket
    of the natural key (``dim_bucket``), and a batch reads + rewrites
    ONLY the buckets its keys hash into, with dynamic partition
    overwrite — cost per trigger is O(touched buckets), not O(dimension),
    the same read-merge-write shape as :func:`make_window_upsert`.

    Idempotent under foreachBatch's at-least-once replay: re-merging an
    already-applied batch rebuilds the same touched keys from
    (existing versions ∪ batch), and the (key, ts) dedupe collapses the
    duplicates — the rebuilt versions are identical, so the overwrite
    converges (proven by the replay test in tests/test_streaming.py).
    Size ``n_buckets`` so one bucket ≈ one comfortable file; hot-key
    histories stay together by construction."""
    from data_cube_spark.operators.scd import (
        scd2_from_changelog,
        scd2_merge_changes,
    )

    keys = [key] if isinstance(key, str) else list(key)

    def bucket_of(df: DataFrame):
        return F.pmod(
            F.xxhash64(*[F.col(k) for k in keys]), F.lit(int(n_buckets))
        ).cast("int")

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.columns:
            return
        b = batch_df.persist()
        touched = [r[0] for r in
                   b.select(bucket_of(b).alias("_b")).distinct().collect()]
        if not touched:
            b.unpersist()
            return
        # Only a PROVABLY absent/empty target falls back to the from-scratch
        # build; any other failure (transient read error, a failed merge
        # job) must propagate so the micro-batch fails and foreachBatch
        # replays it — swallowing it here would silently replace the
        # touched keys' full version history with batch-only history.
        existing_all = _read_target(spark, target_dir)
        if existing_all is not None:
            existing = (
                existing_all
                .where(F.col("dim_bucket").isin(touched))
                .drop("dim_bucket")
            )
            # a micro-batch's key set is trigger-bounded — broadcast
            merged = scd2_merge_changes(existing, b, keys, ts_col,
                                        broadcast_keys=True)
        else:  # first batch: no target yet
            merged = scd2_from_changelog(b, keys, ts_col)
        out = merged.withColumn("dim_bucket", bucket_of(merged))
        # eager materialization: the target's files must be fully read
        # before the dynamic overwrite starts deleting them
        out = out.localCheckpoint()
        (
            out.repartition("dim_bucket")
            .write.mode("overwrite")
            .partitionBy("dim_bucket")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(target_dir)
        )
        b.unpersist()

    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(source_dir)
    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
