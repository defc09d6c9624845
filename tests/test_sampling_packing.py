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


# -- curation operators ------------------------------------------------------

def test_cap_per_group_binds_and_is_deterministic(tables):
    from data_cube_spark.operators.curation import cap_per_group
    from data_cube_spark.operators.sampling import draw_hex

    docs = tables["documents"]
    out = cap_per_group(docs, ["source"], 5,
                        order=[draw_hex("doc_id", salt="cap")])
    per = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(n == 5 for n in per.values())
    again = cap_per_group(docs, ["source"], 5,
                          order=[draw_hex("doc_id", salt="cap")])
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in again.collect())


def test_percentile_filter_keeps_top_fraction(spark):
    from data_cube_spark.operators.curation import percentile_filter

    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(11)], "id long, g string, s double"
    )
    kept = sorted(r["id"] for r in
                  percentile_filter(df, "s", ["g"], 0.5, tiebreak="id").collect())
    # percent_rank over s DESC: ids 10..5 have pr 0.0..0.5
    assert kept == [5, 6, 7, 8, 9, 10]


def test_percentile_filter_single_row_group_kept(spark):
    from data_cube_spark.operators.curation import percentile_filter

    df = spark.createDataFrame([(1, "solo", 0.0)], "id long, g string, s double")
    assert percentile_filter(df, "s", ["g"], 0.0, tiebreak="id").count() == 1


def test_chunk_texts_covers_text_exactly(spark):
    from data_cube_spark.operators.curation import chunk_texts

    text = "abcdefghij" * 10  # 100 chars
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(chunk_texts(df, 30, overlap=10).collect(),
                  key=lambda r: r["chunk_id"])
    # stride 20; n_chunks = ceil((100-30)/20)+1 = 5
    assert [r["chunk_id"] for r in rows] == [0, 1, 2, 3, 4]
    for r in rows:
        start = r["chunk_id"] * 20
        assert r["chunk_text"] == text[start:start + 30]
    # reconstruction: strip the 10-char overlap from every chunk after the first
    rebuilt = rows[0]["chunk_text"] + "".join(
        r["chunk_text"][10:] for r in rows[1:])
    assert rebuilt == text


def test_chunk_texts_short_doc_single_chunk(spark):
    from data_cube_spark.operators.curation import chunk_texts

    df = spark.createDataFrame([(1, "tiny")], "doc_id long, text string")
    rows = chunk_texts(df, 200, overlap=50).collect()
    assert len(rows) == 1 and rows[0]["chunk_text"] == "tiny"
    with pytest.raises(ValueError):
        chunk_texts(df, 100, overlap=100)


def test_token_vocab_counts(spark):
    from data_cube_spark.operators.curation import token_vocab

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b c  b"), (3, " a ")],
        "doc_id long, text string",
    )
    rows = {r["token"]: (r["n_total"], r["n_docs"])
            for r in token_vocab(df, 10).collect()}
    assert rows == {"a": (3, 2), "b": (3, 2), "c": (1, 1)}
    top = token_vocab(df, 1).collect()
    assert len(top) == 1 and top[0]["token"] == "a"  # tie broken by token asc


def test_assign_split_partitions_everything(tables):
    from data_cube_spark.operators.sampling import assign_split

    docs = tables["documents"]
    out = assign_split(docs, {"train": 0.9, "val": 0.05, "test": 0.05})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0) + counts.get("test", 0)
    # stability: a subset of the corpus gets identical assignments
    sub = assign_split(docs.where(F.col("doc_id") < 100),
                       {"train": 0.9, "val": 0.05, "test": 0.05})
    full = {r["doc_id"]: r["split"] for r in out.collect()}
    for r in sub.collect():
        assert full[r["doc_id"]] == r["split"]


def test_shuffle_positions_dense_permutation(tables):
    from data_cube_spark.operators.sampling import shuffle_positions

    docs = tables["documents"].limit(200)
    out = shuffle_positions(docs)
    pos = sorted(r["position"] for r in out.collect())
    assert pos == list(range(1, 201))
    # deterministic across invocations
    again = {r["doc_id"]: r["position"]
             for r in shuffle_positions(docs).collect()}
    first = {r["doc_id"]: r["position"] for r in out.collect()}
    assert first == again


def test_tfidf_hand_computed(spark):
    import math

    from data_cube_spark.operators.curation import tfidf_top_terms

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    rows = {(r["doc_id"], r["token"]): (r["tf"], r["tfidf"], r["term_rank"])
            for r in tfidf_top_terms(df, 2).collect()}
    idf_rare = math.log(3 / 2) + 1       # df=1, N=2
    # doc 1: a (tf=2, idf=1) -> 2.0 ranks above b (1*idf_rare ~ 1.405)
    assert rows[(1, "a")][2] == 1 and abs(rows[(1, "a")][1] - 2.0) < 1e-12
    assert rows[(1, "b")][2] == 2 and abs(rows[(1, "b")][1] - idf_rare) < 1e-12
    # doc 2: rare c outranks universal a
    assert rows[(2, "c")][2] == 1 and rows[(2, "a")][2] == 2


def test_sample_negatives_invariants(spark, tables):
    """Negatives: never the anchor, never a positive, distinct per
    anchor, ranks 1..k dense, deterministic across reruns."""
    from data_cube_spark.operators.sampling import sample_negatives

    docs = tables["documents"]
    pos = docs.where(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("anchor_id"),
        (F.col("doc_id") + 2).alias("pos_id"))
    out = sample_negatives(pos, docs, 3).collect()
    again = sample_negatives(pos, docs, 3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    positives = {(r.anchor_id, r.pos_id) for r in pos.collect()}
    by_anchor = {}
    for r in out:
        assert r.neg_id != r.anchor_id
        assert (r.anchor_id, r.neg_id) not in positives
        by_anchor.setdefault(r.anchor_id, []).append(r.neg_rank)
    for a, ranks in by_anchor.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3

    import pytest as _pytest
    with _pytest.raises(ValueError):
        sample_negatives(pos, docs, 0)
    with _pytest.raises(ValueError):
        sample_negatives(pos, docs.where(F.lit(False)), 3)
