"""r15 measurement harness for the pipeline family (VERDICT r14 #1).

Phase-profiles `pipeline_pretraining`'s five stages and runs INTERLEAVED
same-session noop A/Bs (guide §1.4) between the shipped composition and
candidate rewrites that remove the duplicated dedup/decontam subtrees:

  pretraining variants
    V0  shipped: lang/quality joined back onto `clean` (plan carries 3
        copies of the dedup+decontam chain: the join branches each embed
        one)
    V1  inline `.where()` of the lang/quality predicates (they are
        filter-only in this query — no output duplication), and the
        contamination corpus is the UNDEDUPED `%97 != 0` stream
        (contamination is a per-document pure function of text, so
        scoring duplicate rows cannot change which kept-ids are flagged)
    V2  V1 + contamination corpus pre-filtered by the lang/quality
        predicate (a kept-id only matters if it survives the gate;
        per-doc purity again)
    V3  V2 + contamination corpus pre-filtered by the train-split draw

  clean_corpus variants
    C0  shipped: lang/quality branches computed over `kept` (each branch
        embeds a copy of the dedup aggregate tower)
    C1  branches computed over the raw table `d` (lang/quality are pure
        per-row of text, doc_id unique, inner join on kept restricts
        identically) — deletes 2 of the 3 dedup towers
    C2  C1 with one combined lang+quality branch (one scan, one join)

Usage: python tools/r15_pipeline_ab.py [check|profile|ab] [sf_dir]
  check    row-identity of every variant vs shipped (collect + compare)
  profile  cumulative phase profile of the shipped pipeline
  ab       interleaved noop A/B, 4 draws each, medians
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

PACK_CAPACITY = 512
PACK_SHARDS = 8


def _lang_pred():
    """Inline twin of text.language_id's pick expression == 'en'."""
    from data_cube_spark.operators.text import LANG_STOPWORDS, _count_matches

    t = F.col("text")
    counts = {lang: _count_matches(t, words)
              for lang, words in LANG_STOPWORDS.items()}
    best = F.greatest(*counts.values())
    pick = F.lit("und")
    for lang in reversed(list(counts)):
        pick = F.when(counts[lang] == best, F.lit(lang)).otherwise(pick)
    pick = F.when(best == 0, F.lit("und")).otherwise(pick)
    return pick == "en"


def _quality_pred():
    """Inline twin of text.quality_score's score expression >= 0.5."""
    from data_cube_spark.operators.text import LANG_STOPWORDS, _count_matches, token_count

    t = F.col("text")
    n_chars = F.length(t).cast("bigint")
    n_tok = token_count("text")
    n_punct = F.length(F.regexp_replace(t, r"[^.!?,;:]", "")).cast("bigint")
    n_stop = _count_matches(t, LANG_STOPWORDS["en"]).cast("bigint")
    nonspace = F.length(F.regexp_replace(t, r"\s+", "")).cast("bigint")
    stopword_ratio = (n_stop / n_tok).cast("double")
    mean_token_len = (nonspace / n_tok).cast("double")
    punct_ratio = (n_punct / n_chars).cast("double")
    score = (
        F.least(stopword_ratio * 4, F.lit(1.0)) * 0.5
        + F.when((mean_token_len >= 3) & (mean_token_len <= 10), 0.3).otherwise(0.0)
        + F.when(punct_ratio <= 0.1, 0.2).otherwise(0.0)
    ).cast("double")
    return score >= 0.5


def _split_train_pred():
    from data_cube_spark.operators.sampling import draw_hex, hex_threshold

    return draw_hex("doc_id", "split") < F.lit(hex_threshold(0.9))


def _pretraining_tail(clean):
    """split -> train -> pack, shared by every variant."""
    from data_cube_spark.operators.packing import pack_concat_chunk
    from data_cube_spark.operators.sampling import assign_split
    from data_cube_spark.operators import text

    split = assign_split(clean, {"train": 0.9, "val": 0.05, "test": 0.05})
    train = split.where(F.col("split") == "train").select(
        "doc_id", text.token_count("text").alias("n_tokens"))
    out = pack_concat_chunk(train, capacity=PACK_CAPACITY,
                            n_shards=PACK_SHARDS)
    return out.select("doc_id", F.col("shard").cast("int").alias("shard"),
                      "seq", "offset", "n_tokens")


def pretraining_variant(spark, sf_dir, variant: str):
    from data_cube_spark.operators import dedup
    from data_cube_spark.operators.decontam import contamination_overlap
    from data_cube_spark.registry import QUERIES
    from data_cube_spark.sources.star import load_tables

    if variant == "V0":
        return QUERIES["pipeline_pretraining"](spark, sf_dir)
    t = load_tables(spark, sf_dir)
    d = t["documents"]
    kept = dedup.dedup_exact(d)
    bench_docs = d.where(F.col("doc_id") % 97 == 0)
    corpus = kept.where(F.col("doc_id") % 97 != 0)
    gate = _lang_pred() & _quality_pred()
    cont_corpus = d.where(F.col("doc_id") % 97 != 0)
    if variant in ("V2", "V3"):
        cont_corpus = cont_corpus.where(gate)
    if variant == "V3":
        cont_corpus = cont_corpus.where(_split_train_pred())
    cont = contamination_overlap(cont_corpus, bench_docs, k=3, threshold=0.5)
    dirty = cont.where(F.col("contaminated") == 1).select("doc_id")
    clean = corpus.join(dirty, "doc_id", "left_anti").where(gate)
    return _pretraining_tail(clean)


def clean_corpus_variant(spark, sf_dir, variant: str):
    from data_cube_spark.operators import dedup, text
    from data_cube_spark.registry import QUERIES
    from data_cube_spark.sources.star import load_tables

    if variant == "C0":
        return QUERIES["pipeline_clean_corpus"](spark, sf_dir)
    t = load_tables(spark, sf_dir)
    d = t["documents"]
    kept = dedup.dedup_exact(d)
    if variant == "C1":
        lang = text.language_id(d)
        qual = text.quality_score(d)
        joined = kept.join(lang, "doc_id").join(qual, "doc_id")
    else:  # C2: one combined branch
        lang = text.language_id(d)
        qual = text.quality_score(d)
        prof = lang.join(qual, "doc_id")
        joined = kept.join(prof, "doc_id")
    return (
        joined
        .where((F.col("lang_pred") == "en") & (F.col("quality") >= 0.5))
        .select(
            "doc_id",
            text.token_count("text").alias("n_tokens"),
            "lang_pred",
            F.col("quality").cast("double").alias("quality"),
        )
    )


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(df):
    t0 = time.perf_counter()
    _noop(df)
    return time.perf_counter() - t0


def _setup(sf_dir):
    from data_cube_spark.session import get_spark
    from data_cube_spark.sources.star import load_tables

    spark = get_spark("r15-pipeline-ab")
    spark.sparkContext.setLogLevel("ERROR")
    tbl = load_tables(spark, sf_dir)
    tbl["documents"].persist().count()  # same warm base as bench ingest
    return spark


def cmd_check(sf_dir):
    spark = _setup(sf_dir)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    base_p = rows(pretraining_variant(spark, sf_dir, "V0"))
    for v in ("V1", "V2", "V3"):
        got = rows(pretraining_variant(spark, sf_dir, v))
        print(f"pretraining {v}: rows {'IDENTICAL' if got == base_p else 'MISMATCH'}"
              f" ({len(got)} vs {len(base_p)})")
    base_c = rows(clean_corpus_variant(spark, sf_dir, "C0"))
    for v in ("C1", "C2"):
        got = rows(clean_corpus_variant(spark, sf_dir, v))
        print(f"clean_corpus {v}: rows {'IDENTICAL' if got == base_c else 'MISMATCH'}"
              f" ({len(got)} vs {len(base_c)})")


def cmd_profile(sf_dir):
    """Cumulative phase profile of the SHIPPED pipeline (noop medians,
    3 draws after 1 warm)."""
    from data_cube_spark.operators import dedup, text
    from data_cube_spark.operators.decontam import contamination_overlap
    from data_cube_spark.sources.star import load_tables

    spark = _setup(sf_dir)
    t = load_tables(spark, sf_dir)
    d = t["documents"]
    kept = dedup.dedup_exact(d)
    bench_docs = d.where(F.col("doc_id") % 97 == 0)
    corpus = kept.where(F.col("doc_id") % 97 != 0)
    cont = contamination_overlap(corpus, bench_docs, k=3, threshold=0.5)
    dirty = cont.where(F.col("contaminated") == 1).select("doc_id")
    clean = corpus.join(dirty, "doc_id", "left_anti")
    lang = text.language_id(clean)
    qual = text.quality_score(clean)
    good = (clean.join(lang, "doc_id").join(qual, "doc_id")
            .where((F.col("lang_pred") == "en") & (F.col("quality") >= 0.5)))
    stages = {
        "1_dedup_exact": kept,
        "2_plus_decontam": clean,
        "3_plus_lang_qual_gate": good,
        "4_full_pack": _pretraining_tail(
            good.select("doc_id", "text")),
    }
    # count dup rate once (informs the undeduped-contamination trade)
    n_docs = d.count()
    n_kept = kept.count()
    print(f"docs {n_docs}, kept {n_kept}, dup rate {(n_docs - n_kept) / n_docs:.3%}")
    for name, df in stages.items():
        spark.sparkContext.setJobDescription(f"profile {name}")
        _noop(df)  # warm
        med = statistics.median(_timed(df) for _ in range(3))
        print(f"{name}: {med:.3f}s")


def cmd_ab(sf_dir):
    spark = _setup(sf_dir)
    plans = {
        "pre:V0": lambda: pretraining_variant(spark, sf_dir, "V0"),
        "pre:V1": lambda: pretraining_variant(spark, sf_dir, "V1"),
        "pre:V2": lambda: pretraining_variant(spark, sf_dir, "V2"),
        "pre:V3": lambda: pretraining_variant(spark, sf_dir, "V3"),
        "cc:C0": lambda: clean_corpus_variant(spark, sf_dir, "C0"),
        "cc:C1": lambda: clean_corpus_variant(spark, sf_dir, "C1"),
        "cc:C2": lambda: clean_corpus_variant(spark, sf_dir, "C2"),
    }
    for name, fn in plans.items():  # warm every variant once
        spark.sparkContext.setJobDescription(f"warm {name}")
        _noop(fn())
    draws: dict[str, list[float]] = {k: [] for k in plans}
    for i in range(4):  # interleaved rounds
        for name, fn in plans.items():
            spark.sparkContext.setJobDescription(f"draw{i} {name}")
            draws[name].append(_timed(fn()))
    for name, ds in draws.items():
        print(f"{name}: median {statistics.median(ds):.3f}s "
              f"draws {[round(x, 3) for x in ds]}")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "ab"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    {"check": cmd_check, "profile": cmd_profile, "ab": cmd_ab}[cmd](sf_dir)
