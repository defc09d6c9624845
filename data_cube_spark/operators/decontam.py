"""Benchmark decontamination: flag training documents that share k-gram
shingles with an evaluation/benchmark set — the standard n-gram-overlap
decontamination used by large-LM training pipelines (GPT-3 appendix C
style 13-gram overlap; C4/Dodge-et-al audit style).

Scale design (100 TB corpus vs a few-MB eval set):

- The benchmark side is distinct-shingled and **tiny by construction**
  (eval sets are thousands of documents; the corpus is billions), so the
  overlap check is a broadcast LEFT SEMI join of corpus shingles against
  the benchmark shingle set — the corpus is never self-joined and never
  shuffled on shingle.
- Corpus-side work is one shingle explosion plus a per-doc count — the
  same partial-agg (map-side combine) shape as any rollup, shuffling only
  (doc_id, count) pairs.
- Shingles are xxhash64-hashed 8-byte keys on BOTH sides, so overlap
  counts are preserved (collision probability ~2^-64 per pair) while the
  broadcast set and the shuffle stay narrow.

No reference counterpart (jangorecki/data.cube is an OLAP engine); this
module is part of the north-star training-data pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_cube_spark.operators.dedup import shingle_table


def benchmark_shingles(benchmark: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 3) -> DataFrame:
    """Distinct hashed k-gram shingle set of the benchmark/eval corpus.
    Precompute and persist this when decontaminating many corpora against
    the same eval suite."""
    return (shingle_table(benchmark, text_col, id_col, k, hashed=True)
            .select("shingle").distinct())


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per corpus document: distinct-shingle count, overlap with the
    benchmark shingle set, contamination fraction, and a 0/1 flag at
    ``threshold``.

    ``broadcast_benchmark=False`` falls back to a shuffled semi join for
    the (unusual) case of a benchmark too large to broadcast; AQE then
    picks the strategy.

    Documents with fewer than ``k`` tokens have no shingles and are not
    scored (they cannot be contaminated under this definition).
    """
    c_sh = shingle_table(corpus, text_col, id_col, k, hashed=True)
    b_sh = benchmark_shingles(benchmark, text_col, id_col, k).withColumn(
        "_hit", F.lit(1))
    if broadcast_benchmark:
        b_sh = F.broadcast(b_sh)
    # ONE pass over the corpus shingles (r12, from the sf10 phase
    # profile: this operator was 63 s of pipeline_pretraining's 79 s,
    # and more than half of that was shingling the corpus TWICE — once
    # under the size aggregate and once under a semi-join'd hit
    # aggregate — then shuffling both aggregates into a join). The
    # semi join becomes a broadcast left join against a marker column,
    # so size and overlap come out of the SAME map-side-combined
    # aggregate: one shingle pass, one shuffle of (doc_id, counts),
    # zero aggregate-vs-aggregate joins. Row multiplicity through the
    # marker join is exactly the semi-join-per-row semantics, so
    # counts are unchanged.
    frac = F.col("n_overlap").cast("double") / F.col("n_shingles")
    return (c_sh.join(b_sh, "shingle", "left")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_shingles"),
                 F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_overlap"))
            .withColumn("contamination_frac", frac)
            .withColumn("contaminated",
                        (frac >= F.lit(threshold)).cast("int")))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """The clean corpus: drop documents whose shingle overlap with the
    benchmark reaches ``threshold``. The anti join is left unhinted: the
    flagged-id set is usually broadcast-sized but is data-dependent (a
    fully contaminated corpus flags everything), so AQE picks the
    strategy from the runtime size."""
    flagged = (contamination_overlap(
        corpus, benchmark, text_col, id_col, k, threshold,
        broadcast_benchmark)
        .where(F.col("contaminated") == 1)
        .select(id_col))
    return corpus.join(flagged, id_col, "left_anti")
