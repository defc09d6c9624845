"""Sampling + packing operators: determinism, quota/mixture contracts,
packing invariants, and a local python oracle for the greedy packer."""

import pytest
from pyspark.sql import functions as F

from data_cube_spark.operators.packing import (
    pack_concat_chunk,
    pack_greedy,
    packing_stats,
    with_shard,
)
from data_cube_spark.operators.sampling import (
    hex_threshold,
    mixture_sample,
    sample_fraction,
    sample_stratified_n,
)
from data_cube_spark.operators.text import token_count

CAP = 512


@pytest.fixture(scope="module")
def docs(tables):
    return tables["documents"].select("doc_id", "lang", "source", "text")


def test_sample_fraction_deterministic_and_nested(docs):
    """Reruns pick the same rows, and a smaller fraction is a SUBSET of a
    larger one (threshold filters nest by construction) — the property
    that makes md5-draw sampling reproducible across cluster runs."""
    n = docs.count()
    s10 = {r[0] for r in sample_fraction(docs, 0.10).select("doc_id").collect()}
    s10b = {r[0] for r in sample_fraction(docs, 0.10).select("doc_id").collect()}
    s30 = {r[0] for r in sample_fraction(docs, 0.30).select("doc_id").collect()}
    assert s10 == s10b
    assert s10 <= s30
    assert abs(len(s30) / n - 0.30) < 0.12


def test_hex_threshold_saturates():
    assert hex_threshold(1.0) == "g"
    assert hex_threshold(0.0) == "0" * 15
    assert hex_threshold(0.25) == "4" + "0" * 14


def test_sample_stratified_exact_quota(docs):
    out = sample_stratified_n(docs, ["lang"], 20)
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    avail = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {lang: min(20, n) for lang, n in avail.items()}


def test_mixture_sample_rates(docs):
    """Full-retention sources keep everything; zero-default drops unlisted
    sources entirely."""
    out = mixture_sample(docs, {"src0": 1.0, "src1": 0.5}, default=0.0)
    kept = {r["source"]: r["n"] for r in
            out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_src0 = docs.where(F.col("source") == "src0").count()
    assert kept.get("src0") == n_src0
    assert set(kept) <= {"src0", "src1"}
    assert 0 < kept.get("src1", 0) < docs.where(F.col("source") == "src1").count()


@pytest.fixture(scope="module")
def toks(docs):
    return docs.select("doc_id", token_count("text").alias("n_tokens"))


def test_pack_concat_chunk_offsets(toks):
    """Offsets are the per-shard cumulative token stream in doc_id order;
    seq is the chunk the document STARTS in; input partitioning doesn't
    change the result (determinism under repartition)."""
    out = pack_concat_chunk(toks, CAP, n_shards=4).collect()
    by_shard = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        exp = by_shard.get(r["shard"], 0)
        assert r["offset"] == exp
        assert r["seq"] == exp // CAP
        by_shard[r["shard"]] = exp + r["n_tokens"]
    again = pack_concat_chunk(toks.repartition(7), CAP, n_shards=4).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_pack_greedy_matches_python_oracle(toks):
    """The distributed greedy packer equals a sequential python greedy
    pack of each shard, and no sequence exceeds capacity unless it is a
    single over-long document."""
    rows = with_shard(toks, 4).select("doc_id", "shard", "n_tokens").collect()
    expect = {}
    shards = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["doc_id"])):
        seq, fill = shards.get(r["shard"], (0, 0))
        t = r["n_tokens"]
        if fill > 0 and fill + t > CAP:
            seq, fill = seq + 1, 0
        expect[r["doc_id"]] = (r["shard"], seq, fill)
        shards[r["shard"]] = (seq, fill + t)

    got = pack_greedy(toks, CAP, n_shards=4)
    got_map = {r["doc_id"]: (r["shard"], r["seq"], r["offset"])
               for r in got.collect()}
    assert got_map == expect

    per_seq = got.groupBy("shard", "seq").agg(
        F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("n")).collect()
    assert all(r["t"] <= CAP or r["n"] == 1 for r in per_seq)


def test_packing_stats_fill_rate(toks):
    packed = pack_greedy(toks, CAP, n_shards=4)
    stats = packing_stats(packed, CAP).collect()
    assert stats
    for r in stats:
        assert 0 < r["fill_rate"] <= 1.01
