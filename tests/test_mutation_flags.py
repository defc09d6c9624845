"""Mutation tests for the invariant-FLAG oracles (VERDICT r13 #7).

Several registry queries assert Spark-computed boolean invariants
(``lsh_found``, ``stream_eq_batch``, ``refrozen_eq_rebuild``) that the
DuckDB oracle pins to TRUE. A flag gate is only evidence if it CAN
fail: these tests break each property by construction — drop the LSH
candidates, skip the refreeze, bypass the streaming dedup — and assert
the flag flips FALSE end-to-end through the same registry entry the
driver checks. If a refactor ever hardcodes a flag (or disconnects it
from the computation it summarizes), these fail first.
"""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_lsh_found_flag_can_fail(spark, monkeypatch):
    """``embedding_near_pairs_lsh`` stamps lsh_found per exact-truth
    pair from the OR-amplified bucket join. Mutation: the candidate
    generator returns nothing — every flag must flip FALSE (were the
    flag hardcoded or joined wrong, it would stay TRUE)."""
    from data_cube_spark.operators import similarity as sim
    from data_cube_spark.registry import QUERIES

    def empty_cands(df, *a, **k):
        return df.sparkSession.createDataFrame(
            [], "id_a long, id_b long")

    monkeypatch.setattr(sim, "lsh_near_pairs", empty_cands)
    rows = QUERIES["embedding_near_pairs_lsh"](spark, SF_DIR).collect()
    assert rows, "truth pairs must exist for the flag to be evidence"
    assert all(not r["lsh_found"] for r in rows)


def test_refrozen_eq_rebuild_flag_can_fail(spark, monkeypatch):
    """``prefix_stream_ingest`` stamps refrozen_eq_rebuild from the
    nightly sweep's refreeze + a postings-identity check against a
    from-scratch rebuild. Mutation: the sweep runs WITHOUT the
    refreeze (the exact 'skips refreeze' construction from the task) —
    the table never lands in sweep['refrozen'] and the stale frozen
    order's postings diverge from the rebuild, so the flag must flip
    FALSE on every row while the stream-vs-batch flag stays TRUE (the
    dedup itself was not broken)."""
    from data_cube_spark.operators import index_maintenance as im
    from data_cube_spark.registry import QUERIES

    real = im.compact_all

    def no_refreeze(spark_, **kw):
        kw["refreeze_prefix"] = False
        return real(spark_, **kw)

    monkeypatch.setattr(im, "compact_all", no_refreeze)
    out = QUERIES["prefix_stream_ingest"](spark, SF_DIR).toPandas()
    assert len(out) > 0
    assert not out["refrozen_eq_rebuild"].any()
    assert out["stream_eq_batch"].all()


def test_stream_eq_batch_flag_can_fail(spark, monkeypatch):
    """Mutation: the streaming ingest is swapped for a pass-through
    that writes every arriving document to the target with NO dedup
    and NO index fold-in. The sequential batch twin still drops
    near-dups, so stream_eq_batch must flip FALSE for exactly the
    documents the twin suppressed — proving the flag compares the two
    pipelines rather than asserting TRUE by construction."""
    from data_cube_spark.registry import QUERIES
    from data_cube_spark.streaming import cube_stream as cs

    def passthrough(spark_, source_dir, schema, checkpoint_dir,
                    target_dir, index_table, **kw):
        return (spark_.readStream.schema(schema).parquet(source_dir)
                .writeStream.format("parquet")
                .option("path", target_dir)
                .option("checkpointLocation", checkpoint_dir)
                .trigger(availableNow=True))

    monkeypatch.setattr(cs, "streaming_prefix_ingest", passthrough)
    out = QUERIES["prefix_stream_ingest"](spark, SF_DIR).toPandas()
    assert len(out) > 0
    flipped = (~out["stream_eq_batch"]).sum()
    assert flipped > 0, (
        "pass-through stream produced the same survivor set as the "
        "deduped twin — the corpus has no near-dups at this sf, so the "
        "flag is not being exercised")
