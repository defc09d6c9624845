"""Round-9 maintenance-surface tests (VERDICT r8 #1 / ADVICE r8): the
frozen-order prefix append, its drift counters and consistency check,
IVF cell-skew stamping, and the list_indexes/compact_all health wiring.
These are the regression bars the r8 snapshot landed without."""

import pytest
from pyspark.sql import functions as F

from data_cube_spark.operators import dedup, similarity
from data_cube_spark.operators.index_maintenance import (
    compact_all,
    list_indexes,
)


def _drop(spark, *tables):
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


PFX_TABLES = ("_prefix", "_df", "_sets")


def test_append_prefix_index_read_equals_rebuild(spark, tables, tmp_path):
    """Exactness bar for the O(batch) append: reading an APPENDED index
    returns bit-for-bit the same pairs as (a) a full rebuild over the
    grown corpus and (b) the inline exact operator — the prefix theorem
    holds for the frozen order even though the appended docs' shingles
    rank under stale (or zero) document frequencies."""
    docs = tables["documents"]
    corpus = docs.where(F.col("doc_id") % 3 == 0)
    extra = docs.where(F.col("doc_id") % 3 == 1)
    batch = docs.where(F.col("doc_id") % 3 == 2)
    try:
        dedup.write_prefix_index(corpus, "t_apx", n_buckets=4,
                                 threshold=0.4, path=str(tmp_path / "a"))
        stats = dedup.append_prefix_index(extra, "t_apx")
        assert stats["appended_docs"] == extra.count()
        got = sorted(map(tuple, dedup.incremental_prefix_pairs_indexed(
            batch, "t_apx", threshold=0.4).collect()))
        # (a) vs a full rebuild over corpus + extra (fresh frozen order)
        dedup.write_prefix_index(corpus.unionByName(extra), "t_apx_rb",
                                 n_buckets=4, threshold=0.4,
                                 path=str(tmp_path / "b"))
        rebuilt = sorted(map(tuple, dedup.incremental_prefix_pairs_indexed(
            batch, "t_apx_rb", threshold=0.4).collect()))
        # (b) vs the inline exact R x S operator
        inline = sorted(map(tuple, dedup.jaccard_pairs_prefix_rs(
            batch, corpus.unionByName(extra), threshold=0.4).collect()))
        assert got == rebuilt == inline
        assert len(got) > 0
        # higher query threshold still exact over the appended index
        got_hi = sorted(map(tuple, dedup.incremental_prefix_pairs_indexed(
            batch, "t_apx", threshold=0.6).collect()))
        inline_hi = sorted(map(tuple, dedup.jaccard_pairs_prefix_rs(
            batch, corpus.unionByName(extra), threshold=0.6).collect()))
        assert got_hi == inline_hi
    finally:
        _drop(spark, *[f"t_apx{s}" for s in PFX_TABLES],
              *[f"t_apx_rb{s}" for s in PFX_TABLES])


def test_prefix_v1_index_read_and_append_fallback(spark, tables, tmp_path):
    """Format-v2 migration contract: a v1 prefix index (postings
    without the ``_pos`` rank column) written by an older library
    stays fully serviceable — reads take the legacy distinct path with
    the SAME exact pairs, and appends keep working without migrating
    the layout (the computed ranks are dropped by insertInto's
    positional select)."""
    from data_cube_spark.operators.dedup import _index_meta, _set_index_meta
    from data_cube_spark.sources.ingest import write_bucketed

    docs = tables["documents"]
    corpus = docs.where(F.col("doc_id") % 3 == 0)
    extra = docs.where(F.col("doc_id") % 3 == 1)
    batch = docs.where(F.col("doc_id") % 3 == 2)
    try:
        dedup.write_prefix_index(corpus, "t_v1pfx", n_buckets=4,
                                 threshold=0.4, path=str(tmp_path / "a"))
        # downgrade the postings member to the v1 shape: no _pos
        # column, format_version 1 (managed rewrite, same bucketing)
        meta = _index_meta(spark, "t_v1pfx_prefix")
        v1 = (spark.table("t_v1pfx_prefix")
              .select("corpus_id", "shingle", "_sz").localCheckpoint())
        spark.sql("DROP TABLE t_v1pfx_prefix")
        write_bucketed(v1, "t_v1pfx_prefix", ["shingle"], 4)
        _set_index_meta(spark, "t_v1pfx_prefix",
                        {**meta, "format_version": "1"})
        assert "_pos" not in spark.table("t_v1pfx_prefix").columns
        got = sorted(map(tuple, dedup.incremental_prefix_pairs_indexed(
            batch, "t_v1pfx", threshold=0.4).collect()))
        inline = sorted(map(tuple, dedup.jaccard_pairs_prefix_rs(
            batch, corpus, threshold=0.4).collect()))
        assert got == inline and len(got) > 0
        # appends to the v1 layout still work and reads stay exact
        dedup.append_prefix_index(extra, "t_v1pfx")
        assert "_pos" not in spark.table("t_v1pfx_prefix").columns
        got2 = sorted(map(tuple, dedup.incremental_prefix_pairs_indexed(
            batch, "t_v1pfx", threshold=0.4).collect()))
        inline2 = sorted(map(tuple, dedup.jaccard_pairs_prefix_rs(
            batch, corpus.unionByName(extra), threshold=0.4).collect()))
        assert got2 == inline2
        dedup.check_prefix_consistency(spark, "t_v1pfx")
    finally:
        _drop(spark, *[f"t_v1pfx{s}" for s in PFX_TABLES])


def test_ppjoin_positional_filter_prunes_candidates(spark):
    """The r12 scale fix is observable at the kernel level: candidate
    rows whose positional overlap bound cannot reach the threshold are
    pruned (the legacy size filter alone keeps every one of these),
    boundary cases with an exactly-integral overlap floor are KEPT
    (the epsilon guard), and the layered row-then-pair filter kills a
    pair whose only early match failed the row bound. Exactness over
    arbitrary corpora is the Hypothesis property's job; this pins the
    PRUNING itself. All at t=0.5, where alpha = ceil((pa+pb)/3)."""
    rows = [
        # pruned at ROW level: i=1,j=6 -> 1+min(0,5)+min(9,4)=5 < 7
        (1, 10, 1, 6, 10, 10),
        # kept: first-position match, bound 10 >= 7
        (2, 20, 1, 1, 10, 10),
        # kept at the exact pair-bound boundary: 1+min(6,10)=7 >= 7
        (3, 30, 2, 2, 8, 12),
        # kept at an exactly-integral alpha=4 (epsilon guard): bound 4
        (4, 40, 3, 3, 6, 6),
        # pruned at ROW level with asymmetric positions: 1+1+1=3 < 4
        (5, 50, 5, 2, 6, 6),
        # pruned at PAIR level: the early row (i=1,j=6) fails the row
        # bound (5 < 7), the late row (i=6,j=6) passes it (10 >= 7)
        # but the surviving min positions give 1+min(4,4)=5 < 7
        (7, 70, 1, 6, 10, 10),
        (7, 70, 6, 6, 10, 10),
    ]
    df = spark.createDataFrame(
        rows, "batch_id long, corpus_id long, _i int, _j int, "
              "_pa long, _pb long")
    got = {(r.batch_id, r.corpus_id)
           for r in dedup._ppjoin_candidates(
               df, "batch_id", "corpus_id", 0.5).collect()}
    assert got == {(2, 20), (3, 30), (4, 40)}
    # end-to-end: a genuine near-dup (10-element sets sharing 9)
    # always survives the positional filters
    sh = spark.createDataFrame(
        [(1, f"s{i}") for i in range(10)]
        + [(2, f"s{i}") for i in range(9)] + [(2, "t0")],
        "doc_id long, shingle string")
    survivors = {(r.id_a, r.id_b)
                 for r in dedup.prefix_filter_candidates(
                     sh, "doc_id", 0.5).collect()}
    assert survivors == {(1, 2)}


def test_append_prefix_drift_counters_and_health(spark, tables, tmp_path):
    """Drift counters accumulate across appends, needs_rebuild flips
    past PREFIX_DF_DRIFT_BOUND, list_indexes surfaces the health dict,
    and compact_all returns (and warns) the rebuild advice."""
    docs = tables["documents"]
    corpus = docs.where(F.col("doc_id") % 10 == 0)  # small base
    extra1 = docs.where(F.col("doc_id") % 10 == 1)
    extra2 = docs.where(F.col("doc_id") % 10 == 2)
    try:
        dedup.write_prefix_index(corpus, "t_drift", n_buckets=4,
                                 threshold=0.5, path=str(tmp_path / "d"))
        base = corpus.count()
        s1 = dedup.append_prefix_index(extra1, "t_drift")
        assert s1["appended_docs"] == extra1.count()
        assert s1["appended_postings"] > 0
        s2 = dedup.append_prefix_index(extra2, "t_drift")
        # cumulative, not per-batch
        assert s2["appended_docs"] == extra1.count() + extra2.count()
        assert s2["appended_postings"] > s1["appended_postings"]
        assert s2["unseen_postings"] >= s1["unseen_postings"]
        drift = s2["df_drift"]
        assert drift == pytest.approx(s2["appended_docs"] / base)
        # base ~equal-size slices: two appends over one base slice is
        # ~2x growth, far past the 0.5 bound
        assert drift > dedup.PREFIX_DF_DRIFT_BOUND
        assert s2["needs_rebuild"]
        # the stamped counters drive list_indexes health
        idx = {i["name"]: i for i in list_indexes(spark, prefix="t_drift")}
        h = idx["t_drift"]["health"]
        assert h["df_drift"] == pytest.approx(drift)
        assert h["needs_rebuild"]
        # the direct staleness measure rides along: unseen posting share
        assert h["unseen_ratio"] == pytest.approx(
            s2["unseen_postings"] / s2["appended_postings"])
        assert 0.0 <= h["unseen_ratio"] <= 1.0
        # ...and the nightly sweep warns with rebuild advice
        with pytest.warns(UserWarning, match="write_prefix_index"):
            sweep = compact_all(spark, prefix="t_drift")
        assert any("drift" in w for w in sweep["warnings"])
        # a rebuild re-freezes the order and zeroes the counters
        dedup.write_prefix_index(
            corpus.unionByName(extra1).unionByName(extra2), "t_drift",
            n_buckets=4, threshold=0.5, path=str(tmp_path / "d2"))
        idx = {i["name"]: i for i in list_indexes(spark, prefix="t_drift")}
        assert idx["t_drift"]["health"]["df_drift"] == 0.0
        assert not idx["t_drift"]["health"]["needs_rebuild"]
        assert idx["t_drift"]["health"]["unseen_ratio"] == 0.0
    finally:
        _drop(spark, *[f"t_drift{s}" for s in PFX_TABLES])


def test_append_prefix_frozen_order_guard(spark, tables, tmp_path):
    """An index written before frozen-order metadata existed (no
    order_version stamp) must refuse appends — appending under an
    unversioned order could silently disagree with later readers."""
    docs = tables["documents"].limit(30)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    extra = docs.where(F.col("doc_id") % 2 == 1)
    try:
        dedup.write_prefix_index(corpus, "t_frz", n_buckets=4,
                                 threshold=0.5, path=str(tmp_path / "f"))
        spark.sql("ALTER TABLE t_frz_prefix UNSET TBLPROPERTIES "
                  "('spark_graft.index.order_version')")
        with pytest.raises(ValueError, match="predates frozen-order"):
            dedup.append_prefix_index(extra, "t_frz")
    finally:
        _drop(spark, *[f"t_frz{s}" for s in PFX_TABLES])


def test_reappend_then_compact_prefix_removes_duplicate_pairs(
        spark, tables, tmp_path):
    """ADVICE r8 (verified empirically by the advisor): re-appending a
    batch makes the read path emit DUPLICATE pairs (duplicate _sets rows
    survive the candidate distinct via the verification join) until
    compact_prefix_index re-distincts — and compact_all now dispatches
    it on the nightly sweep."""
    docs = tables["documents"].limit(60)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    # appended docs are EXACT copies of the query batch under fresh ids,
    # so every batch doc is guaranteed a pair THROUGH the appended rows
    extra = batch.withColumn("doc_id", F.col("doc_id") + 500_000)
    try:
        dedup.write_prefix_index(corpus, "t_rpx", n_buckets=4,
                                 threshold=0.3, path=str(tmp_path / "r"))
        dedup.append_prefix_index(extra, "t_rpx")
        want = sorted(map(tuple, dedup.incremental_prefix_pairs_indexed(
            batch, "t_rpx", threshold=0.3).collect()))
        assert len(want) > 0
        dedup.append_prefix_index(extra, "t_rpx")  # same batch again
        dup = sorted(map(tuple, dedup.incremental_prefix_pairs_indexed(
            batch, "t_rpx", threshold=0.3).collect()))
        assert len(dup) > len(want)  # duplicates leak until compaction
        sweep = compact_all(spark, prefix="t_rpx")
        assert sweep["removed"]["t_rpx"] > 0
        got = sorted(map(tuple, dedup.incremental_prefix_pairs_indexed(
            batch, "t_rpx", threshold=0.3).collect()))
        assert got == want
        # idempotent: a second sweep removes nothing
        assert compact_all(spark, prefix="t_rpx")["removed"]["t_rpx"] == 0
    finally:
        _drop(spark, *[f"t_rpx{s}" for s in PFX_TABLES])


def test_prefix_consistency_check_fails_loudly(spark, tables, tmp_path):
    """ADVICE r8: a half-applied append (postings without a set row, or
    vice versa) silently drops pairs in the verification join — the
    consistency check turns that into a raise at compaction time."""
    docs = tables["documents"].limit(30)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    try:
        dedup.write_prefix_index(corpus, "t_sync", n_buckets=4,
                                 threshold=0.5, path=str(tmp_path / "s"))
        assert dedup.check_prefix_consistency(spark, "t_sync") == \
            corpus.count()
        # simulate the failure window between the two insertInto calls:
        # a doc appears in _sets but has no _prefix postings
        spark.sql("INSERT INTO t_sync_sets "
                  "SELECT corpus_id + 1000000 AS corpus_id, _set "
                  "FROM t_sync_sets LIMIT 1")
        with pytest.raises(ValueError, match="out of sync"):
            dedup.check_prefix_consistency(spark, "t_sync")
        with pytest.raises(ValueError, match="out of sync"):
            dedup.compact_prefix_index(spark, "t_sync")
    finally:
        _drop(spark, *[f"t_sync{s}" for s in PFX_TABLES])


def test_ivf_skew_stamping_and_retrain_flag(spark, tables, tmp_path):
    """VERDICT r8: a skewed append must raise the stamped cell_skew past
    IVF_SKEW_BOUND, flip needs_retrain in the append return AND in
    list_indexes health, and make compact_all warn retrain advice."""
    emb = tables["embeddings"].limit(60)
    try:
        similarity.write_ivf_index(emb, "t_skw", n_cells=8, n_buckets=2,
                                   path=str(tmp_path / "i"))
        idx = {i["name"]: i for i in list_indexes(spark, prefix="t_skw")}
        base_skew = idx["t_skw"]["health"]["cell_skew"]
        assert base_skew is not None and base_skew >= 1.0
        # pile 300 copies of ONE vector (fresh ids) into its single
        # nearest cell: max occupancy ~300+, mean ~(360/8) -> skew > 4
        one = emb.limit(1).select("embedding")
        skewed = (spark.range(300)
                  .select((F.col("id") + 10_000_000).alias("vec_id"))
                  .crossJoin(F.broadcast(one)))
        stats = similarity.append_to_ivf_index(skewed, "t_skw")
        assert stats["cell_skew"] > similarity.IVF_SKEW_BOUND
        assert stats["needs_retrain"]
        idx = {i["name"]: i for i in list_indexes(spark, prefix="t_skw")}
        h = idx["t_skw"]["health"]
        assert h["cell_skew"] == pytest.approx(stats["cell_skew"])
        assert h["needs_retrain"]
        with pytest.warns(UserWarning, match="write_ivf_index"):
            sweep = compact_all(spark, prefix="t_skw")
        assert any("skew" in w for w in sweep["warnings"])
        # never a correctness bound: reads still serve exact cosine
        q = emb.limit(3)
        assert similarity.ann_ivf_topk_indexed(q, "t_skw", k=2).count() > 0
    finally:
        _drop(spark, "t_skw_cells", "t_skw_centroids")


def test_broadcast_cosine_empty_matrix_diagnostic(spark):
    """ADVICE r8: an EMPTY broadcast matrix with candidate pairs present
    (the fully out-of-sync case) must raise the diagnostic ValueError,
    not an IndexError from the -1 clip."""
    v_empty = spark.createDataFrame(
        [], "vec_id long, _vec array<double>, _norm double")
    pairs = spark.createDataFrame([(1, 2)], "a long, b long")

    udf1 = similarity._broadcast_cosine_udf(spark, v_empty, "vec_id")
    with pytest.raises(Exception, match="out of sync"):
        pairs.select(udf1("a", "b").alias("c")).collect()

    v_ok = spark.createDataFrame(
        [(1, [1.0, 0.0], 1.0), (2, [0.0, 1.0], 1.0)],
        "vec_id long, _vec array<double>, _norm double")
    udf2 = similarity._two_sided_cosine_udf(spark, v_ok, v_empty,
                                            "vec_id", "vec_id")
    with pytest.raises(Exception, match="out of sync"):
        pairs.select(udf2("a", "b").alias("c")).collect()
    # and a present-on-both-sides pair still scores
    udf3 = similarity._two_sided_cosine_udf(spark, v_ok, v_ok,
                                            "vec_id", "vec_id")
    row = pairs.select(udf3("a", "b").alias("c")).head()
    assert row["c"] == pytest.approx(0.0)


def test_member_sync_check_minhash_and_embedding(spark, tables, tmp_path):
    """The ADVICE r8 half-applied-append hazard, generalized: a doc in
    _sig without _bands rows (or a vector in _vec without _buckets rows)
    silently generates no candidates — the compact helpers now refuse
    that state instead of blessing it."""
    docs = tables["documents"].limit(30)
    emb = tables["embeddings"].limit(30)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    vecs = emb.where(F.col("vec_id") % 2 == 0)
    try:
        dedup.write_minhash_index(corpus, "t_msync", n_buckets=4,
                                  path=str(tmp_path / "m"))
        assert dedup.compact_minhash_index(spark, "t_msync") == 0
        spark.sql("INSERT INTO t_msync_sig "
                  "SELECT corpus_id + 1000000 AS corpus_id, signature "
                  "FROM t_msync_sig LIMIT 1")
        with pytest.raises(ValueError, match="out of sync"):
            dedup.compact_minhash_index(spark, "t_msync")

        similarity.write_embedding_index(vecs, "t_esync", n_buckets=4,
                                         path=str(tmp_path / "e"))
        assert similarity.compact_embedding_index(spark, "t_esync") == 0
        spark.sql("INSERT INTO t_esync_vec "
                  "SELECT corpus_id + 1000000 AS corpus_id, _vec, _norm "
                  "FROM t_esync_vec LIMIT 1")
        with pytest.raises(ValueError, match="out of sync"):
            similarity.compact_embedding_index(spark, "t_esync")
    finally:
        _drop(spark, "t_msync_sig", "t_msync_bands",
              "t_esync_buckets", "t_esync_vec")


def test_maintenance_cli_in_process(spark, tables, tmp_path, capsys):
    """The operational CLI over the index fleet: `indexes` prints kind +
    health (flags included), `compact` prints removed counts and the
    rebuild/retrain warnings — in-process, since get_spark reuses the
    active session (the in-memory catalog is process-local)."""
    from data_cube_spark.__main__ import main

    docs = tables["documents"].limit(40)
    corpus = docs.where(F.col("doc_id") % 4 == 0)
    extra = docs.where(F.col("doc_id") % 4 != 0)
    try:
        dedup.write_prefix_index(corpus, "t_climt", n_buckets=2,
                                 threshold=0.5, path=str(tmp_path / "c"))
        dedup.append_prefix_index(extra, "t_climt")  # drift ~3x > bound
        assert main(["indexes", "t_climt"]) == 0
        out = capsys.readouterr().out
        assert "t_climt  [prefix] needs_rebuild" in out
        assert "df_drift:" in out and "unseen_ratio:" in out
        with pytest.warns(UserWarning, match="write_prefix_index"):
            assert main(["compact", "t_climt"]) == 0
        out = capsys.readouterr().out
        assert "compacted t_climt:" in out
        assert "WARNING:" in out and "drift" in out
    finally:
        _drop(spark, *[f"t_climt{s}" for s in PFX_TABLES])


def test_compact_ivf_restamps_skew(spark, tables, tmp_path):
    """Duplicate-inflated cell skew must not survive the compaction that
    resolved it: re-appending the same skewed batch doubles one cell's
    rows; after compact the re-measured (lower) skew is re-stamped and
    the health flag reflects the compacted table."""
    emb = tables["embeddings"].limit(60)
    try:
        similarity.write_ivf_index(emb, "t_rsk", n_cells=8, n_buckets=2,
                                   path=str(tmp_path / "i"))
        one = emb.limit(1).select("embedding")
        skewed = (spark.range(120)
                  .select((F.col("id") + 20_000_000).alias("vec_id"))
                  .crossJoin(F.broadcast(one)))
        s1 = similarity.append_to_ivf_index(skewed, "t_rsk")
        # SAME batch again: pure duplicate rows, doubling the hot cell
        s2 = similarity.append_to_ivf_index(skewed, "t_rsk")
        assert s2["cell_skew"] > s1["cell_skew"]
        removed = similarity.compact_ivf_index(spark, "t_rsk")
        assert removed == 120
        idx = {i["name"]: i for i in
               list_indexes(spark, prefix="t_rsk")}
        restamped = idx["t_rsk"]["health"]["cell_skew"]
        # back to the single-copy skew (duplicates were the inflation)
        assert restamped == pytest.approx(s1["cell_skew"], rel=0.05)
        assert restamped < s2["cell_skew"]
    finally:
        _drop(spark, "t_rsk_cells", "t_rsk_centroids")


def test_format_version_stamped_on_all_kinds(spark, tables, tmp_path):
    """VERDICT r9 #3: every write_* stamps format_version; counter
    re-stamps (append/compact) preserve it; list_indexes health reports
    it on every kind."""
    from data_cube_spark.operators.dedup import INDEX_FORMAT_VERSION

    docs = tables["documents"].limit(30)
    emb = tables["embeddings"].limit(30)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    try:
        dedup.write_fingerprint_index(corpus, "t_fv", n_buckets=2,
                                      path=str(tmp_path / "f"))
        dedup.write_minhash_index(corpus, "t_fv", n_buckets=2,
                                  path=str(tmp_path / "m"))
        dedup.write_prefix_index(corpus, "t_fv", n_buckets=2,
                                 threshold=0.5, path=str(tmp_path / "p"))
        similarity.write_embedding_index(emb, "t_fv", n_buckets=2,
                                         path=str(tmp_path / "e"))
        similarity.write_ivf_index(emb, "t_fv", n_cells=4, n_buckets=2,
                                   path=str(tmp_path / "i"))
        idx = list_indexes(spark, prefix="t_fv")
        assert {i["kind"] for i in idx} == {
            "fingerprint", "minhash", "prefix", "embedding", "ivf"}
        for i in idx:
            assert i["params"]["format_version"] == str(INDEX_FORMAT_VERSION)
            assert i["health"]["format_version"] == INDEX_FORMAT_VERSION
            assert not i["health"]["format_too_new"]
        # a counter re-stamp (append) keeps the version
        extra = docs.where(F.col("doc_id") % 2 == 1)
        dedup.append_prefix_index(extra, "t_fv")
        one = emb.limit(1).select("embedding")
        more = (spark.range(5)
                .select((F.col("id") + 30_000_000).alias("vec_id"))
                .crossJoin(F.broadcast(one)))
        similarity.append_to_ivf_index(more, "t_fv")
        for i in list_indexes(spark, prefix="t_fv"):
            assert i["health"]["format_version"] == INDEX_FORMAT_VERSION
    finally:
        _drop(spark, "t_fv_fp", "t_fv_sig", "t_fv_bands",
              "t_fv_buckets", "t_fv_vec", "t_fv_cells", "t_fv_centroids",
              *[f"t_fv{s}" for s in PFX_TABLES])


def test_format_version_newer_refused_everywhere(spark, tables, tmp_path):
    """VERDICT r9 #3 refusal bar: an index stamped with a NEWER format
    than the library knows is refused — loudly, with the rebuild remedy
    — by the read path, the append path, and the compactor; list_indexes
    still lists it (flagged format_too_new) and the fleet sweep skips it
    with a warning instead of misreading it."""
    docs = tables["documents"].limit(30)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    extra = docs.where(F.col("doc_id") % 2 == 1)
    try:
        dedup.write_prefix_index(corpus, "t_fnew", n_buckets=2,
                                 threshold=0.5, path=str(tmp_path / "n"))
        spark.sql("ALTER TABLE t_fnew_prefix SET TBLPROPERTIES "
                  "('spark_graft.index.format_version'='99')")
        with pytest.raises(ValueError, match="format_version"):
            dedup.incremental_prefix_pairs_indexed(
                extra, "t_fnew", threshold=0.5).collect()
        with pytest.raises(ValueError, match="format_version"):
            dedup.append_prefix_index(extra, "t_fnew")
        with pytest.raises(ValueError, match="format_version"):
            dedup.compact_prefix_index(spark, "t_fnew")
        idx = {i["name"]: i for i in list_indexes(spark, prefix="t_fnew")}
        h = idx["t_fnew"]["health"]
        assert h["format_version"] == 99 and h["format_too_new"]
        sweep = compact_all(spark, prefix="t_fnew")
        assert "t_fnew" not in sweep["removed"]
        assert any("t_fnew" in w and "format_version" in w
                   for w in sweep["warnings"])
    finally:
        _drop(spark, *[f"t_fnew{s}" for s in PFX_TABLES])


def test_compact_refuses_interleaved_append(spark, tables, tmp_path,
                                            monkeypatch):
    """VERDICT r9 #5: the single-writer maintenance contract is fenced.
    An append that lands between the compaction's snapshot
    materialization and its overwrite would have its rows silently
    dropped — the maintenance_epoch re-check turns that into a loud
    ValueError with the retry remedy, leaving the table untouched; the
    retry then succeeds and the appended rows survive."""
    docs = tables["documents"].limit(40)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    extra = docs.where(F.col("doc_id") % 2 == 1).limit(5)
    # duplicates to give the compactor real work
    dedup.write_prefix_index(corpus, "t_race", n_buckets=2,
                             threshold=0.5, path=str(tmp_path / "r"))
    dedup.append_prefix_index(extra, "t_race")
    dedup.append_prefix_index(extra, "t_race")

    # patch the CONCRETE DataFrame class (pyspark.sql.DataFrame is the
    # abstract parent in Spark 4; instances resolve the subclass method)
    DataFrame = type(docs)
    orig = DataFrame.localCheckpoint
    fired = {"done": False}

    def interleave(self, *a, **k):
        out = orig(self, *a, **k)
        if not fired["done"]:
            # the first checkpoint inside the sweep is the compactor's
            # distinct materialization — append right after it, exactly
            # the lost-update window
            fired["done"] = True
            dedup.append_prefix_index(extra, "t_race")
        return out

    try:
        monkeypatch.setattr(DataFrame, "localCheckpoint", interleave)
        with pytest.raises(ValueError, match="maintenance_epoch"):
            dedup.compact_prefix_index(spark, "t_race")
        monkeypatch.setattr(DataFrame, "localCheckpoint", orig)
        # nothing was lost: the interleaved append's rows are readable
        n_docs = dedup.check_prefix_consistency(spark, "t_race")
        assert n_docs == corpus.count() + extra.count()
        # the retry remedy works and the compaction now lands
        assert dedup.compact_prefix_index(spark, "t_race") > 0
        probe = (docs.where(F.col("doc_id") % 2 == 1).limit(5)
                 .withColumn("doc_id", F.col("doc_id") + 900_000))
        got = sorted(map(tuple, dedup.incremental_prefix_pairs_indexed(
            probe, "t_race", threshold=0.5).collect()))
        want = sorted(map(tuple, dedup.jaccard_pairs_prefix_rs(
            probe, corpus.unionByName(extra),
            threshold=0.5).collect()))
        assert got == want and len(got) > 0
    finally:
        _drop(spark, *[f"t_race{s}" for s in PFX_TABLES])


def test_compact_all_warns_from_post_compaction_health(
        spark, tables, tmp_path):
    """ADVICE r9: compact_all must evaluate health AFTER the sweep, not
    from the pre-compaction snapshot. A replayed append inflates
    df_drift past the bound; the compaction restamps it below the bound
    — so the sweep that resolved the drift must NOT still demand a
    rebuild from the stale counters."""
    import warnings as _w

    docs = tables["documents"].limit(40)
    corpus = docs.where(F.col("doc_id") % 3 > 0)       # ~2/3 base
    extra = docs.where(F.col("doc_id") % 3 == 0).limit(8)
    try:
        dedup.write_prefix_index(corpus, "t_pch", n_buckets=4,
                                 threshold=0.5, path=str(tmp_path / "h"))
        dedup.append_prefix_index(extra, "t_pch")
        s2 = dedup.append_prefix_index(extra, "t_pch")  # replay twin
        base = corpus.count()
        single_drift = extra.count() / base
        assert single_drift < dedup.PREFIX_DF_DRIFT_BOUND  # post-compact ok
        assert s2["df_drift"] > dedup.PREFIX_DF_DRIFT_BOUND  # pre-sweep bad
        # pre-sweep snapshot demands a rebuild...
        idx = {i["name"]: i for i in list_indexes(spark, prefix="t_pch")}
        assert idx["t_pch"]["health"]["needs_rebuild"]
        # ...but the sweep removes the duplicates, restamps, and the
        # warning is judged on the state it LEAVES BEHIND: silence.
        with _w.catch_warnings():
            _w.simplefilter("error")  # any UserWarning -> test failure
            sweep = compact_all(spark, prefix="t_pch")
        assert sweep["removed"]["t_pch"] > 0
        assert sweep["warnings"] == []
        idx = {i["name"]: i for i in list_indexes(spark, prefix="t_pch")}
        assert not idx["t_pch"]["health"]["needs_rebuild"]
    finally:
        _drop(spark, *[f"t_pch{s}" for s in PFX_TABLES])


def test_compact_all_continues_past_member_sync_failure(
        spark, tables, tmp_path):
    """ADVICE r9: one half-appended index must not abort the fleet
    sweep — its consistency ValueError becomes a warning and the
    remaining indexes still compact."""
    docs = tables["documents"].limit(40)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    try:
        dedup.write_prefix_index(corpus, "t_ca1", n_buckets=2,
                                 threshold=0.5, path=str(tmp_path / "1"))
        dedup.write_prefix_index(corpus, "t_ca2", n_buckets=2,
                                 threshold=0.5, path=str(tmp_path / "2"))
        # replay an append on the healthy index so the sweep has real
        # duplicate rows to remove there
        extra = docs.where(F.col("doc_id") % 2 == 1).limit(6)
        dedup.append_prefix_index(extra, "t_ca2")
        dedup.append_prefix_index(extra, "t_ca2")
        # break member sync on t_ca1 (sets row without postings)
        spark.sql("INSERT INTO t_ca1_sets "
                  "SELECT corpus_id + 1000000 AS corpus_id, _set "
                  "FROM t_ca1_sets LIMIT 1")
        sweep = compact_all(spark, prefix="t_ca")
        # broken index: skipped with the diagnostic surfaced
        assert "t_ca1" not in sweep["removed"]
        assert any("t_ca1" in w and "skipped" in w and "out of sync" in w
                   for w in sweep["warnings"])
        # healthy index: still swept
        assert sweep["removed"]["t_ca2"] > 0
    finally:
        _drop(spark, *[f"t_ca1{s}" for s in PFX_TABLES],
              *[f"t_ca2{s}" for s in PFX_TABLES])


def test_compact_prefix_restamps_appended_docs(spark, tables, tmp_path):
    """A replayed append inflates appended_docs with duplicates; the
    compaction re-stamps it from ground truth (distinct _sets ids -
    base_docs), so a duplicate-inflated df_drift cannot keep demanding
    a rebuild the sweep already resolved."""
    docs = tables["documents"].limit(40)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    extra = docs.where(F.col("doc_id") % 2 == 1)
    try:
        dedup.write_prefix_index(corpus, "t_rst", n_buckets=4,
                                 threshold=0.5, path=str(tmp_path / "p"))
        dedup.append_prefix_index(extra, "t_rst")
        s2 = dedup.append_prefix_index(extra, "t_rst")  # replay twin
        n_extra = extra.count()
        assert s2["appended_docs"] == 2 * n_extra  # inflated
        assert dedup.compact_prefix_index(spark, "t_rst") > 0
        idx = {i["name"]: i for i in
               list_indexes(spark, prefix="t_rst")}
        h = idx["t_rst"]["health"]
        assert int(idx["t_rst"]["params"]["appended_docs"]) == n_extra
        assert h["df_drift"] == pytest.approx(n_extra / corpus.count())
    finally:
        _drop(spark, *[f"t_rst{s}" for s in PFX_TABLES])


def test_append_fence_detects_interleaved_append(spark, tables, tmp_path,
                                                 monkeypatch):
    """VERDICT r10 #3: the fence is now SYMMETRIC — appends claim the
    epoch BEFORE their first insert and re-check it after, so two
    concurrent appends' counter stamps cannot silently lost-update each
    other. Append B fires inside append A's insert window (between A's
    two insertInto calls): A's post-insert fence check raises loudly,
    A's rows ARE inserted but its counters are NOT stamped over B's —
    B's counter mass survives — and the documented remedy (re-append
    the batch, then compact) converges to ground-truth counters and
    exact pairs."""
    from pyspark.sql.readwriter import DataFrameWriter

    from data_cube_spark.operators.dedup import _index_meta

    docs = tables["documents"].limit(60)
    corpus = docs.where(F.col("doc_id") % 3 == 0)
    batch_a = (docs.where(F.col("doc_id") % 3 == 1).limit(5)
               .withColumn("doc_id", F.col("doc_id") + 100_000)
               .localCheckpoint())
    batch_b = (docs.where(F.col("doc_id") % 3 == 2).limit(5)
               .withColumn("doc_id", F.col("doc_id") + 200_000)
               .localCheckpoint())
    n_a, n_b = batch_a.count(), batch_b.count()
    dedup.write_prefix_index(corpus, "t_apprace", n_buckets=2,
                             threshold=0.5, path=str(tmp_path / "ar"))

    orig = DataFrameWriter.insertInto
    fired = {"done": False}

    def interleave(self, tableName, *a, **k):
        out = orig(self, tableName, *a, **k)
        if not fired["done"] and tableName == "t_apprace_prefix":
            # A has claimed its epoch and landed its first member's
            # rows — exactly the window a second writer must not share
            fired["done"] = True
            dedup.append_prefix_index(batch_b, "t_apprace")
        return out

    try:
        monkeypatch.setattr(DataFrameWriter, "insertInto", interleave)
        with pytest.raises(ValueError, match="maintenance_epoch.*"
                           "single-writer"):
            dedup.append_prefix_index(batch_a, "t_apprace")
        monkeypatch.setattr(DataFrameWriter, "insertInto", orig)
        # B's counter mass survived (A refused to stamp its stale
        # read-modify-write over it) and BOTH appends' rows are present
        meta = _index_meta(spark, "t_apprace_prefix")
        assert int(meta["appended_docs"]) == n_b
        n_docs = dedup.check_prefix_consistency(spark, "t_apprace")
        assert n_docs == corpus.count() + n_a + n_b
        # the named remedy: re-append A (idempotent under compaction),
        # then compact — counters land on ground truth
        dedup.append_prefix_index(batch_a, "t_apprace")
        assert int(_index_meta(spark, "t_apprace_prefix")
                   ["appended_docs"]) == n_a + n_b
        assert dedup.compact_prefix_index(spark, "t_apprace") > 0
        assert int(_index_meta(spark, "t_apprace_prefix")
                   ["appended_docs"]) == n_a + n_b
        probe = (docs.where(F.col("doc_id") % 3 == 1).limit(5)
                 .withColumn("doc_id", F.col("doc_id") + 900_000))
        got = sorted(map(tuple, dedup.incremental_prefix_pairs_indexed(
            probe, "t_apprace", threshold=0.5).collect()))
        want = sorted(map(tuple, dedup.jaccard_pairs_prefix_rs(
            probe, corpus.unionByName(batch_a).unionByName(batch_b),
            threshold=0.5).collect()))
        assert got == want and len(got) > 0
    finally:
        _drop(spark, *[f"t_apprace{s}" for s in PFX_TABLES])


def test_append_fence_detects_compaction_overwrite(spark, tables,
                                                   tmp_path, monkeypatch):
    """The other half of the symmetric fence: a compaction whose
    overwrite lands INSIDE an append's insert window success-bumps the
    epoch, so the append's post-insert re-check raises (its rows that
    landed during the compactor's materialization may have been
    dropped by the overwrite) instead of silently losing them — the
    r10 fence could not see this case at all because compaction
    preserved the epoch."""
    from pyspark.sql.readwriter import DataFrameWriter

    docs = tables["documents"].limit(40)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    extra = (docs.where(F.col("doc_id") % 2 == 1).limit(5)
             .withColumn("doc_id", F.col("doc_id") + 100_000)
             .localCheckpoint())
    dedup.write_prefix_index(corpus, "t_cmprace", n_buckets=2,
                             threshold=0.5, path=str(tmp_path / "cr"))
    # duplicates so the compactor has real work
    dedup.append_prefix_index(extra, "t_cmprace")
    dedup.append_prefix_index(extra, "t_cmprace")

    orig = DataFrameWriter.insertInto
    fired = {"done": False}

    def interleave(self, tableName, *a, **k):
        out = orig(self, tableName, *a, **k)
        if not fired["done"] and tableName == "t_cmprace_prefix":
            fired["done"] = True
            # the appender has claimed its epoch and is mid-insert;
            # this compaction snapshots AFTER the claim (so its own
            # re-check passes), overwrites, and success-bumps
            dedup._compact_index_table(spark, "t_cmprace_prefix",
                                       ["shingle"])
        return out

    try:
        monkeypatch.setattr(DataFrameWriter, "insertInto", interleave)
        with pytest.raises(ValueError, match="maintenance_epoch.*"
                           "single-writer"):
            dedup.append_prefix_index(extra, "t_cmprace")
    finally:
        monkeypatch.setattr(DataFrameWriter, "insertInto", orig)
        _drop(spark, *[f"t_cmprace{s}" for s in PFX_TABLES])


def test_cross_session_attach_and_sweep(spark, tmp_path):
    """VERDICT r10 #6: the maintenance catalog is no longer
    process-local. A SEPARATE process (own JVM, own SparkSession, own
    in-memory catalog) writes a fingerprint index into a warehouse
    directory and exits — its catalog entries die with it. This
    session then attaches the index from the on-disk sidecars
    (``attach_indexes`` / ``list_indexes(warehouse=...)``), sweeps it
    with ``compact_all`` (the appended duplicates are really removed),
    and serves the indexed read — the nightly-fleet-sweep contract for
    the metastore-less case."""
    import os
    import subprocess
    import sys

    from data_cube_spark.operators.index_maintenance import attach_indexes

    wh = str(tmp_path / "xwh")
    script = tmp_path / "writer.py"
    script.write_text(
        "import sys\n"
        "from data_cube_spark.session import get_spark\n"
        "from data_cube_spark.operators import dedup\n"
        "wh, sf = sys.argv[1], sys.argv[2]\n"
        "spark = get_spark('xsession-writer', cpus=2,\n"
        "                  extra_conf={'spark.sql.warehouse.dir': wh})\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "docs = (spark.read.parquet(sf + '/documents.parquet')\n"
        "        .select('doc_id', 'text').limit(30).localCheckpoint())\n"
        "dedup.write_fingerprint_index(docs, 't_xsess', n_buckets=2)\n"
        "# duplicate append so the other session's sweep has real work\n"
        "dedup.append_to_fingerprint_index(docs, 't_xsess')\n"
        "spark.stop()\n"
    )
    # the writer must import the package from the repo even when it is
    # not pip-installed: the script lives in tmp_path, so sys.path[0] is
    # NOT the repo root — ship the package's parent dir via PYTHONPATH
    import data_cube_spark

    pkg_root = os.path.dirname(os.path.dirname(
        os.path.abspath(data_cube_spark.__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run([sys.executable, str(script), wh,
                    "/root/testdata/sf0.001"], check=True, cwd=pkg_root,
                   env=env, timeout=600, capture_output=True)
    try:
        attached = attach_indexes(spark, wh)
        assert "t_xsess_fp" in attached
        # re-attach is idempotent
        assert attach_indexes(spark, wh) == []
        idx = {i["name"]: i for i in list_indexes(spark, prefix="t_xsess")}
        assert idx["t_xsess"]["kind"] == "fingerprint"
        assert idx["t_xsess"]["complete"]
        assert idx["t_xsess"]["params"]["canonical"] == "True"
        # the sweep compacts the other session's duplicate append
        sweep = compact_all(spark, prefix="t_xsess")
        assert sweep["removed"]["t_xsess"] > 0
        # and the indexed read serves: every doc is already present
        docs = (spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text").limit(30))
        assert dedup.dedup_exact_indexed(docs, "t_xsess").count() == 0
    finally:
        _drop(spark, "t_xsess_fp")


def test_append_fence_conflict_across_real_threads(spark, tables, tmp_path):
    """VERDICT r11 #6: the single-writer contract under GENUINE
    concurrency — two real threads of one session (no monkeypatched
    interleavings) append different batches behind a start barrier.
    A violation must fail LOUDLY on at least one side, through either
    of the two real mechanisms: the post-insert epoch fence
    (maintenance_epoch ValueError), or a Hadoop committer abort —
    concurrent insertInto jobs on one table path share the
    FileOutputCommitter's ``_temporary/0``, so an overlapped commit
    window aborts one job with an exception before any of its files
    are committed. Both are loud, never silent row loss, and the
    documented remedy is the same for both: re-append the failed batch
    (idempotent under compaction) and sweep. The test pins exactly
    that recovery: after re-appending every batch sequentially, the
    full document set is present, structurally consistent, and the
    counters re-derive from ground truth."""
    import threading

    docs = tables["documents"]
    corpus = docs.where(F.col("doc_id") % 3 == 0)
    b1 = docs.where(F.col("doc_id") % 3 == 1).localCheckpoint()
    b2 = docs.where(F.col("doc_id") % 3 == 2).localCheckpoint()
    dedup.write_prefix_index(corpus, "t_racer", n_buckets=2,
                             threshold=0.4, path=str(tmp_path / "r"))
    try:
        outcomes: dict = {}
        # the barrier makes overlap near-certain; the retry covers the
        # pathological schedule where one thread finished its whole
        # append before the other ever claimed (then both legitimately
        # pass — re-racing the same batches is safe)
        for _ in range(3):
            outcomes.clear()
            barrier = threading.Barrier(2)

            def run(tag, batch):
                barrier.wait()
                try:
                    dedup.append_prefix_index(batch, "t_racer")
                    outcomes[tag] = "ok"
                except Exception as ex:  # noqa: BLE001 — loudness probe
                    outcomes[tag] = f"{type(ex).__name__}: {ex}"

            ts = [threading.Thread(target=run, args=("b1", b1)),
                  threading.Thread(target=run, args=("b2", b2))]
            for t in ts:
                t.start()
            for t in ts:
                t.join(300)
            if any(v != "ok" for v in outcomes.values()):
                break
        failures = {k: v for k, v in outcomes.items() if v != "ok"}
        if not failures:
            # the property under test is LOUD-OR-COMMITTED, not that
            # races must occur: on a slow/loaded host the scheduler can
            # legitimately serialize both multi-second appends in every
            # race, and both then commit cleanly (ADVICE r12). That is
            # a correct outcome with nothing left to assert about
            # loudness — skip rather than fail spuriously.
            pytest.skip("concurrent appends never interleaved in 3 "
                        "races — loud-or-committed unexercised on this "
                        "schedule (both sides committed cleanly)")
        # every failure is one of the two documented LOUD mechanisms
        assert all(("maintenance_epoch" in v) or ("Py4JJavaError" in v)
                   or ("SparkException" in v) for v in failures.values()), \
            failures
        # the documented remedy: re-append every batch sequentially
        # (idempotent under compaction), then sweep
        for batch in (b1, b2):
            try:
                dedup.append_prefix_index(batch, "t_racer")
            except ValueError:
                # a fence refusal here means counters lag; rows landed
                pass
        for s in PFX_TABLES:
            spark.catalog.refreshTable(f"t_racer{s}")
        want = {r[0] for r in corpus.select("doc_id").collect()}
        want |= {r[0] for r in b1.select("doc_id").collect()}
        want |= {r[0] for r in b2.select("doc_id").collect()}
        got = {r[0] for r in spark.table("t_racer_sets")
               .select("corpus_id").distinct().collect()}
        assert got == want
        dedup.check_prefix_consistency(spark, "t_racer")
        # the sweep heals: duplicates re-distincted, counters re-derived
        compact_all(spark, prefix="t_racer")
        idx = {i["name"]: i for i in list_indexes(spark, prefix="t_racer")}
        assert idx["t_racer"]["complete"]
    finally:
        _drop(spark, *[f"t_racer{s}" for s in PFX_TABLES])


def test_concurrent_appends_across_processes_never_lose_rows(
        spark, tmp_path):
    """The cross-PROCESS half of VERDICT r11 #6: two separate processes
    (own JVMs, own in-memory catalogs) attach the same on-disk prefix
    index from its sidecars and append different batches at the same
    time, start-synchronized through a go-file. Separate catalogs mean
    the epoch fence CANNOT observe the other process — the documented
    coordination point for a fleet is the sidecar catalog plus the
    single-writer contract — so what the format must guarantee instead
    is LOUD-OR-COMMITTED: each process either exits cleanly with its
    rows committed, or fails with a visible nonzero exit (overlapped
    insert jobs share the Hadoop committer's ``_temporary/0`` on the
    table path, which can abort one mid-commit before ANY of its files
    land) — never silent partial state. The remedy is the same as for
    the fence: re-append the failed batch. After that, the full
    document set is present, structurally consistent, and the sweep
    re-derives true counters from ground truth."""
    import os
    import subprocess
    import sys
    import time

    import data_cube_spark

    wh = tmp_path / "pwh"
    wh.mkdir()
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    corpus = docs.where(F.col("doc_id") % 3 == 0)
    # members directly under the warehouse dir: attach_indexes scans
    # one level deep for sidecars
    dedup.write_prefix_index(corpus, "t_prace", n_buckets=2,
                             threshold=0.4, path=str(wh))
    appender = tmp_path / "appender.py"
    appender.write_text(
        "import os, sys, time\n"
        "from data_cube_spark.session import get_spark\n"
        "from data_cube_spark.operators import dedup\n"
        "from data_cube_spark.operators.index_maintenance import "
        "attach_indexes\n"
        "wh, tag, rem, sync = sys.argv[1:5]\n"
        "spark = get_spark('prace-' + tag, cpus=2,\n"
        "                  extra_conf={'spark.sql.warehouse.dir': wh})\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "attach_indexes(spark, wh)\n"
        "batch = (spark.read.parquet("
        "'/root/testdata/sf0.001/documents.parquet')\n"
        "         .select('doc_id', 'text')\n"
        "         .where('doc_id % 3 = ' + rem).localCheckpoint())\n"
        "open(os.path.join(sync, 'ready_' + tag), 'w').close()\n"
        "while not os.path.exists(os.path.join(sync, 'go')):\n"
        "    time.sleep(0.02)\n"
        "dedup.append_prefix_index(batch, 't_prace')\n"
        "spark.stop()\n"
    )
    pkg_root = os.path.dirname(os.path.dirname(
        os.path.abspath(data_cube_spark.__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    sync = tmp_path / "sync"
    sync.mkdir()
    try:
        procs = [subprocess.Popen(
            [sys.executable, str(appender), str(wh), tag, rem, str(sync)],
            cwd=pkg_root, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
            for tag, rem in (("a", "1"), ("b", "2"))]
        deadline = time.time() + 300
        while time.time() < deadline and not (
                (sync / "ready_a").exists() and (sync / "ready_b").exists()):
            time.sleep(0.1)
        assert (sync / "ready_a").exists() and (sync / "ready_b").exists()
        (sync / "go").touch()
        failed_rems = []
        for p, rem in zip(procs, ("1", "2")):
            out, err = p.communicate(timeout=600)
            if p.returncode != 0:
                # loud, not silent: the committer abort surfaces as a
                # nonzero exit with the Spark error on stderr
                assert ("SparkException" in err or "Py4JJavaError" in err
                        or "Error" in err), err[-2000:]
                failed_rems.append(rem)
        # the documented remedy for a loud failure: re-append the batch
        for rem in failed_rems:
            dedup.append_prefix_index(
                docs.where(F.col("doc_id") % 3 == int(rem)), "t_prace")
        # this session created the tables, so only its file-listing
        # cache is stale — refresh, then prove both batches landed
        for s in PFX_TABLES:
            spark.catalog.refreshTable(f"t_prace{s}")
        want = {r[0] for r in docs.select("doc_id").collect()}
        got = {r[0] for r in spark.table("t_prace_sets")
               .select("corpus_id").distinct().collect()}
        assert got == want
        dedup.check_prefix_consistency(spark, "t_prace")
        compact_all(spark, prefix="t_prace")
        # counter healing rides the duplicate-removal path (disjoint
        # concurrent batches leave nothing to remove and this session's
        # counters were never stamped by the other processes' appends) —
        # re-append one batch here (re-appends are idempotent under
        # compaction), then the sweep re-derives appended_docs from
        # ground truth: distinct set docs minus the stamped base
        dedup.append_prefix_index(
            docs.where(F.col("doc_id") % 3 == 1), "t_prace")
        assert compact_all(spark, prefix="t_prace")["removed"][
            "t_prace"] > 0
        stored = dedup._index_meta(spark, "t_prace_prefix")
        n_base = corpus.count()
        assert int(stored["appended_docs"]) == len(want) - n_base
    finally:
        _drop(spark, *[f"t_prace{s}" for s in PFX_TABLES])


def test_refreeze_prefix_index_acts_on_drift(spark, tables, tmp_path):
    """The drift monitor's missing arm (VERDICT r12 #5): past
    PREFIX_DF_DRIFT_BOUND the sweep used to only WARN; with
    refreeze_prefix=True it re-freezes the shingle order from the
    index's own _sets member — no raw corpus needed — and the index
    comes out indistinguishable from a from-scratch rebuild: identical
    _df order, identical postings INCLUDING the _pos ranks the PPJoin
    pruning reads, counters reset, health clean, reads exact."""
    import warnings as _w

    docs = tables["documents"].limit(60)
    corpus = docs.where(F.col("doc_id") % 3 == 0)
    extra = docs.where(F.col("doc_id") % 3 > 0)
    probe = docs.where(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    try:
        dedup.write_prefix_index(corpus, "t_rfz", n_buckets=4,
                                 threshold=0.5, path=str(tmp_path / "a"))
        stats = dedup.append_prefix_index(extra, "t_rfz")
        assert stats["needs_rebuild"]  # ~2x growth, far past the bound
        old_order = dedup._index_meta(spark, "t_rfz_prefix")["order_version"]
        with _w.catch_warnings():
            _w.simplefilter("error")  # any warning = the monitor failed to act
            sweep = compact_all(spark, prefix="t_rfz", refreeze_prefix=True)
        assert sweep["refrozen"]["t_rfz"] != old_order
        assert not sweep["warnings"]
        meta = dedup._index_meta(spark, "t_rfz_prefix")
        assert meta["order_version"] == sweep["refrozen"]["t_rfz"]
        assert int(meta["appended_docs"]) == 0
        assert int(meta["base_docs"]) == corpus.count() + extra.count()
        idx = {i["name"]: i for i in list_indexes(spark, prefix="t_rfz")}
        assert idx["t_rfz"]["health"]["df_drift"] == 0.0
        assert not idx["t_rfz"]["health"]["needs_rebuild"]
        # refrozen == rebuilt, member for member (order AND positions)
        dedup.write_prefix_index(corpus.unionByName(extra), "t_rfz_rb",
                                 n_buckets=4, threshold=0.5,
                                 path=str(tmp_path / "b"))
        for member in ("_df", "_prefix", "_sets"):
            a = spark.table(f"t_rfz{member}")
            b = spark.table(f"t_rfz_rb{member}")
            assert a.exceptAll(b).count() == 0, member
            assert b.exceptAll(a).count() == 0, member
        # and the indexed read over the refrozen index stays exact
        got = dedup.incremental_prefix_pairs_indexed(
            probe, "t_rfz", threshold=0.5)
        want = dedup.jaccard_pairs_prefix_rs(
            probe, corpus.unionByName(extra).select("doc_id", "text"),
            threshold=0.5)
        g = {(r[0], r[1]) for r in got.collect()}
        w = {(r[0], r[1]) for r in want.collect()}
        assert g == w
    finally:
        _drop(spark, *[f"t_rfz{s}" for s in PFX_TABLES],
              *[f"t_rfz_rb{s}" for s in PFX_TABLES])
