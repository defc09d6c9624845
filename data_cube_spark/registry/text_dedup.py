"""Document pipeline queries: exact/fuzzy dedup (n-gram, MinHash-LSH,
SimHash, prefix-filter), text analysis, cleaning pipelines,
decontamination, PII, corpus versioning."""

from __future__ import annotations

from data_cube_spark.registry._shared import *  # noqa: F401,F403


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return dedup.exact_groups(t["documents"])


def q_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-normalization dedup groups (fingerprint = md5 of normalized
    text)."""
    t = load_tables(spark, sf_dir)
    return dedup.exact_groups(t["documents"], canonical=True)


def q_dedup_keep_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative-selection policy: canonical dedup groups keeping the
    LONGEST original variant (ties → smallest id) — the standard
    curation choice when near-identical normalization variants differ in
    completeness. One map-side-combined max_by aggregate, no window
    (operators/dedup.py::exact_groups keep='longest')."""
    t = load_tables(spark, sf_dir)
    return dedup.exact_groups(t["documents"], canonical=True, keep="longest")


def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id", text.token_count("text").alias("n_tokens"),
        text.subword_count("text").alias("n_subwords"),
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return text.quality_features(t["documents"])


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return text.language_id(t["documents"])


def q_text_subwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-flavored subword count (word/digit/punct split) next to the
    whitespace token count — both pure JVM expressions."""
    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        text.token_count("text").alias("n_tokens_ws"),
        text.subword_count("text").alias("n_subwords"),
    )


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["documents"].select("doc_id", text.fingerprint("text").alias("fingerprint"))


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document (distinct-token ratio,
    top-token / top-bigram fractions) — pure array expressions, zero
    shuffles."""
    t = load_tables(spark, sf_dir)
    return text.repetition_stats(t["documents"])


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs, blocked by (lang, source), with
    the ``max_df`` stop-shingle cap bounding candidate generation."""
    t = load_tables(spark, sf_dir)
    return dedup.ngram_jaccard_pairs(
        t["documents"], k=3, threshold=0.05, block_cols=["lang", "source"],
        hash_shingles=True, max_df=NGRAM_MAX_DF,
    )


def q_incremental_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingest dedup: odd doc_ids are the NEW batch, even the
    standing corpus; keep the batch docs that are not near-duplicates
    (3-gram Jaccard >= 0.05) of any corpus doc. The inverted-index join is
    batch x corpus only — never a corpus self-join
    (operators/dedup.py::incremental_dedup_keep)."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    batch = docs.where(F.col("doc_id") % 2 == 1)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    kept = dedup.incremental_dedup_keep(
        batch, corpus, k=3, threshold=0.05, max_df=NGRAM_MAX_DF,
        hash_shingles=True,
    )
    return kept.select("doc_id")


def q_incremental_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for continuous-ingest dedup, emitted as a DRIVER-
    CHECKABLE recall invariant (VERDICT r3 #2): the batch (odd doc_ids) is
    banded against a PRECOMPUTED corpus signature table (even doc_ids) —
    only the batch is shingled per run; candidates come from the (band_id,
    band_hash) equi-join. The output rows are the exact batch×corpus
    3-gram-Jaccard pairs at J >= 0.5 (SQL-expressible truth), each
    carrying ``lsh_found`` = whether the MinHash path produced the pair;
    the oracle asserts TRUE for every truth pair. Theory: the data's
    near-dup band is J >= 0.8, where missing all 16 bands has probability
    (1-J^4)^16 <= 2.2e-4 and the 64-hash estimate clears the 0.3 filter by
    >7 sigma; measured 0 misses at sf0.001/0.01/0.1."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    batch = docs.where(F.col("doc_id") % 2 == 1)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    truth = dedup.incremental_ngram_pairs(
        batch, corpus, k=3, threshold=0.5, hash_shingles=True
    ).select("batch_id", "corpus_id", "jaccard")
    # localCheckpoint: the signature table feeds both the banding
    # explosion and the estimate join (in production it is a stored
    # index, read twice); checkpoint blocks free on GC, a persist()
    # would accumulate across repeated registry runs in one session
    corpus_sigs = dedup.minhash_signatures(corpus).localCheckpoint()
    cands = dedup.incremental_minhash_pairs(
        batch, corpus_sigs, threshold=0.3
    ).select("batch_id", "corpus_id", F.lit(True).alias("_f"))
    return (
        truth.join(cands, ["batch_id", "corpus_id"], "left")
        .select("batch_id", "corpus_id", "jaccard",
                F.coalesce("_f", F.lit(False)).alias("lsh_found"))
    )


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, emitted as a DRIVER-CHECKABLE recall
    invariant (VERDICT r3 #2): the exact 3-gram-Jaccard pairs at J >= 0.5
    (SQL-expressible truth — no blocking, no frequency cap) each carry
    ``lsh_found`` = whether the banded MinHash candidate generator
    (signatures -> 16 banded buckets -> estimate filter >= 0.3) produced
    the pair; the oracle asserts TRUE for every truth pair. Theory: at
    the data's near-dup band (J >= 0.8) a pair misses all 16 bands with
    probability (1-J^4)^16 <= 2.2e-4; measured 0 misses at every sf."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    truth = dedup.ngram_jaccard_pairs(
        docs, k=3, threshold=0.5, hash_shingles=True
    ).select("id_a", "id_b", "jaccard")
    cands = dedup.minhash_dedup_pairs(docs, threshold=0.3).select(
        "id_a", "id_b", F.lit(True).alias("_f"))
    return (
        truth.join(cands, ["id_a", "id_b"], "left")
        .select("id_a", "id_b", "jaccard",
                F.coalesce("_f", F.lit(False)).alias("lsh_found"))
    )


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-blocked near-dup pairs, emitted as a DRIVER-
    CHECKABLE invariant (VERDICT r4 #2 — the trick that converted the
    other rows-only queries): the 64-bit signature is engine-specific, so
    the oracle checks DETERMINISTIC consequences instead. SimHash hashes
    the DISTINCT normalized-token set, so two docs with the same token
    set have IDENTICAL signatures — hamming 0, guaranteed to share every
    band and survive the hamming <= 8 filter. The token-set-duplicate
    truth pairs ARE SQL-expressible (equi-join on the sorted-distinct-
    token hash); each truth pair carries ``simhash_found`` (pair emitted
    by the banded operator) and ``hamming_zero``, plus two global output
    invariants (ordering id_a < id_b, hamming bound) on a broadcast
    1-row join. All four are provably TRUE; the oracle asserts them."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    norm = text.normalized("text")
    tokset = F.array_sort(F.array_distinct(text.tokens(norm)))
    h = docs.where(norm != "").select(
        "doc_id", F.md5(F.encode(F.array_join(tokset, " "), "UTF-8")).alias("_th")
    )
    truth = (
        h.alias("a")
        .join(h.alias("b"), F.col("a._th") == F.col("b._th"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    # the operator under test; checkpointed because it feeds both the
    # membership join and the global-invariant aggregate
    pairs = dedup.simhash_near_pairs(
        docs, band_bits=16, max_hamming=8
    ).localCheckpoint()
    flags = pairs.agg(
        F.coalesce(F.bool_and(F.col("id_a") < F.col("id_b")), F.lit(True))
        .alias("pairs_ordered_ok"),
        F.coalesce(F.bool_and(F.col("hamming") <= 8), F.lit(True))
        .alias("hamming_bounded_ok"),
    )
    return (
        truth.join(pairs, ["id_a", "id_b"], "left")
        .crossJoin(F.broadcast(flags))
        .select(
            "id_a", "id_b",
            F.col("hamming").isNotNull().alias("simhash_found"),
            (F.coalesce(F.col("hamming"), F.lit(-1)) == 0).alias("hamming_zero"),
            "pairs_ordered_ok", "hamming_bounded_ok",
        )
    )


def q_pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-star composite: a training-data cleaning pipeline in one
    lazy plan — exact dedup (keep min-id) -> language filter (en) ->
    quality filter (score >= 0.5) -> token counting. One narrow scan +
    one dedup shuffle; every stage is JVM expressions."""
    t = load_tables(spark, sf_dir)
    d = t["documents"]
    kept = dedup.dedup_exact(d)
    # lang/quality are pure per-row functions of text and doc_id is
    # unique, so computing the branches over the RAW table and
    # inner-joining onto the dedup survivors restricts identically —
    # while keeping each branch a single scan instead of embedding a
    # copy of the dedup aggregate tower (r15: 3 content-hash aggregates
    # -> 1; interleaved noop A/B 1.270 -> 1.121 s sf0.1, 2.649 -> 1.887 s
    # sf1 — the win grows with scale as a removed full pass should).
    # Branches stay parallel joins, NOT inline columns: lang_pred and
    # quality are OUTPUT columns here, and the r14 inline experiment
    # measured the pushed-filter regex duplication slower (see
    # OPTIMIZATION_r14.md); the r15 A/B re-confirmed (C2 single-branch
    # 1.714 s vs C1 1.121 s at sf0.1).
    lang = text.language_id(d)
    qual = text.quality_score(d)
    return (
        kept.join(lang, "doc_id").join(qual, "doc_id")
        .where((F.col("lang_pred") == "en") & (F.col("quality") >= 0.5))
        .select(
            "doc_id",
            text.token_count("text").alias("n_tokens"),
            "lang_pred",
            F.col("quality").cast("double").alias("quality"),
        )
    )


def q_pipeline_pretraining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pretraining-prep pipeline as ONE lazy plan: exact dedup
    (keep min-id) -> drop the held-out eval docs (doc_id % 97 == 0) and
    everything 3-gram-contaminated against them -> language + quality
    gate (inline expressions — see below) -> deterministic train split
    (90%) -> concat-and-chunk packing into 512-token sequences across 8
    shards. Every stage is the already-verified operator; composing them
    stays declarative, so Catalyst fuses the narrow stages and the only
    shuffles are the dedup hash, the contamination aggregate + benchmark
    distinct, and the packing shard window (13 exchanges -> 4 in r15)."""
    from data_cube_spark.operators.decontam import contamination_overlap
    from data_cube_spark.operators.packing import pack_concat_chunk
    from data_cube_spark.operators.sampling import assign_split

    t = load_tables(spark, sf_dir)
    d = t["documents"]
    kept = dedup.dedup_exact(d)
    bench = d.where(F.col("doc_id") % 97 == 0)
    corpus = kept.where(F.col("doc_id") % 97 != 0)
    # Contamination is a per-document pure function of text, so scoring
    # the UNDEDUPED %97 stream flags exactly the same kept-ids while the
    # branch carries no copy of the dedup aggregate (r15; dup rate in
    # the corpus is 0.16%, so the extra scored rows are negligible —
    # and at any scale a full md5 pass + exchange outweighs them).
    cont = contamination_overlap(d.where(F.col("doc_id") % 97 != 0),
                                 bench, k=3, threshold=0.5)
    dirty = cont.where(F.col("contaminated") == 1).select("doc_id")
    clean = corpus.join(dirty, "doc_id", "left_anti")
    # lang_pred/quality are FILTER-ONLY in this query (never output), so
    # gate inline instead of joining the gate columns back: the joined
    # form embedded a full copy of the dedup+decontam chain in EACH gate
    # branch (r14 plan: 13 exchanges, 15 scans, 6 content-hash
    # aggregates, 3 corpus shingle explodes). Inline there is exactly
    # one chain. Interleaved noop A/B: 1.744 -> 1.627 s at sf0.1,
    # 3.340 -> 1.939 s at sf1 (1.72x) — the win grows with scale.
    # (Pre-filtering the contamination corpus by the gate predicate was
    # also measured and is SLOWER — 2.25 s at sf0.1, 2.49 s at sf1: the
    # regex gate in that branch costs more than the shingling it saves.)
    good = clean.where((text.language_pick_expr("text") == "en")
                       & (text.quality_score_expr("text") >= 0.5))
    split = assign_split(good, {"train": 0.9, "val": 0.05, "test": 0.05})
    train = split.where(F.col("split") == "train").select(
        "doc_id", text.token_count("text").alias("n_tokens"))
    out = pack_concat_chunk(train, capacity=PACK_CAPACITY,
                            n_shards=PACK_SHARDS)
    return out.select("doc_id", F.col("shard").cast("int").alias("shard"),
                      "seq", "offset", "n_tokens")


def q_decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination scores: docs with doc_id % 97 == 0 play
    the eval set; every other doc is scored by 3-gram shingle overlap
    against the broadcast benchmark shingle set (flag at >= 0.5).
    Corpus-side: one explode + per-doc count, no self-join."""
    from data_cube_spark.operators.decontam import contamination_overlap

    t = load_tables(spark, sf_dir)
    d = t["documents"]
    bench = d.where(F.col("doc_id") % 97 == 0)
    corpus = d.where(F.col("doc_id") % 97 != 0)
    return contamination_overlap(corpus, bench, k=3, threshold=0.5)


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (paragraph-level) exact dedup: every doc gets the same
    synthesized boilerplate footer paragraph appended; the operator must
    keep the footer only at its first global occurrence (min doc_id) and
    strip it everywhere else — the boilerplate-removal use case."""
    t = load_tables(spark, sf_dir)
    aug = t["documents"].select(
        "doc_id",
        F.concat_ws("\n", F.col("text"),
                    F.lit("subscribe to our newsletter for updates"))
        .alias("text"))
    return dedup.paragraph_dedup(aug)


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over documents with deterministic synthesized contact
    info appended (the driver corpus is PII-free by construction, so the
    query plants one of each kind per doc — counts verify detection, the
    redacted-text md5 verifies the exact rewrite). Pure codegen
    expressions, zero shuffles."""
    from data_cube_spark.operators import pii

    t = load_tables(spark, sf_dir)
    aug = t["documents"].select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 ssn 123-45-6789 call +1 555-123-4567"),
        ).alias("text"))
    s = pii.pii_stats(aug)
    return s.select(
        "doc_id", "n_email", "n_ipv4", "n_ssn", "n_phone",
        F.length("redacted").alias("redacted_len"),
        F.md5(F.encode(F.col("redacted"), "UTF-8")).alias("redacted_md5"))


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size character chunking with overlap (200-char chunks,
    50-char overlap): per-row explode, no shuffle
    (operators/curation.py)."""
    from data_cube_spark.operators.curation import chunk_texts

    t = load_tables(spark, sf_dir)
    return chunk_texts(t["documents"], chunk_chars=200, overlap=50)


def q_token_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-20 whitespace tokens by occurrence with
    document frequency — explode + hash aggregate + TakeOrdered top-N
    (operators/curation.py)."""
    from data_cube_spark.operators.curation import token_vocab

    t = load_tables(spark, sf_dir)
    return token_vocab(t["documents"], 20)


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by smoothed tf-idf: tf and
    document-frequency hash aggregates, vocab-sized idf join, broadcast
    1-row corpus count, per-doc top-k window (operators/curation.py)."""
    from data_cube_spark.operators.curation import tfidf_top_terms

    t = load_tables(spark, sf_dir)
    return tfidf_top_terms(t["documents"], 3, round_digits=9).select(
        "doc_id", "token", F.col("tf").cast("bigint").alias("tf"),
        "tfidf", "term_rank",
    )


def q_jaccard_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-Jaccard self-join via prefix filtering
    (operators/dedup.py::jaccard_pairs_prefix, AllPairs/PPJoin family):
    candidates come only from each document's rarest-shingle prefix plus
    a size filter, then one JVM array_intersect verification per
    candidate — no max_df approximation, no all-pairs blowup. The oracle
    is the UNCAPPED exact truth SQL, so a hash match proves the prefix
    filter loses nothing."""
    t = load_tables(spark, sf_dir)
    return dedup.jaccard_pairs_prefix(t["documents"], k=3, threshold=0.5)


def q_incremental_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R×S prefix-filtered EXACT Jaccard (batch = odd doc_ids, corpus =
    even): the continuous-ingest exact-truth path — no corpus self-join,
    prefix-bounded candidates, no max_df approximation
    (operators/dedup.py::jaccard_pairs_prefix_rs). Oracle: the uncapped
    batch×corpus exact SQL — a hash match proves zero loss."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    batch = docs.where(F.col("doc_id") % 2 == 1)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    return dedup.jaccard_pairs_prefix_rs(batch, corpus, k=3, threshold=0.5)


def q_vocab_overlap_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary overlap
    (operators/curation.py::vocab_overlap): each source's top-10 token
    vocabulary, pairwise shared-token counts and vocabulary Jaccard —
    the domain-similarity screen for composing a training mixture. The
    join is vocabulary x vocabulary (bounded by top_n x groups^2), never
    corpus-sized; the division is one double op over exact ints, so the
    oracle hash-matches."""
    from data_cube_spark.operators.curation import vocab_overlap

    docs = load_tables(spark, sf_dir)["documents"]
    return vocab_overlap(docs, 10)


def q_dedup_exact_indexed_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED fingerprint index end-to-end (VERDICT r5 #1): the
    standing corpus's canonical content hashes live in a bucketed catalog
    table (write seed = doc_id % 4 == 0, then append % 4 == 2 TWICE —
    duplicate accumulation — then compact_fingerprint_index re-distincts
    in place), and an ingest batch (odd doc_ids) anti-joins against it —
    corpus side exchange-free off disk, only the batch is hashed and
    shuffled (operators/dedup.py::dedup_exact_indexed; plan pinned in
    tests/test_plans.py). Output: the batch docs whose canonical content
    is NOT in the corpus, with their fingerprint — directly
    SQL-recomputable."""
    import os
    import shutil
    import tempfile

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    base = tempfile.mkdtemp(prefix="sg_fpidx_")
    tbl = os.path.basename(base).lower()
    try:
        seed = docs.where(F.col("doc_id") % 4 == 0)
        extra = docs.where(F.col("doc_id") % 4 == 2)
        batch = docs.where(F.col("doc_id") % 2 == 1)
        dedup.write_fingerprint_index(seed, tbl, n_buckets=8,
                                      path=os.path.join(base, "fp"))
        dedup.append_to_fingerprint_index(extra, tbl)
        dedup.append_to_fingerprint_index(extra, tbl)  # dup accumulation
        dedup.compact_fingerprint_index(spark, tbl)
        out = dedup.dedup_exact_indexed(batch, tbl).select(
            "doc_id", text.fingerprint("text").alias("content_hash"))
        return out.localCheckpoint()  # materialize before the DROP below
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}_fp")
        shutil.rmtree(base, ignore_errors=True)


def q_incremental_prefix_pairs_indexed(
        spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED prefix (AllPairs/PPJoin) index end-to-end (VERDICT
    r5 #1): corpus postings / document frequencies / shingle sets live in
    bucketed catalog tables (write_prefix_index over even doc_ids), and
    the ingest batch (odd doc_ids) is shingled/prefixed per run — the
    corpus side comes off disk pre-partitioned on the shingle join key
    (operators/dedup.py::incremental_prefix_pairs_indexed). EXACT: the
    oracle is the UNCAPPED batch x corpus Jaccard SQL, so a hash match
    proves the persisted prefixes lose nothing."""
    import os
    import shutil
    import tempfile

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    base = tempfile.mkdtemp(prefix="sg_pfxidx_")
    tbl = os.path.basename(base).lower()
    try:
        corpus = docs.where(F.col("doc_id") % 2 == 0)
        batch = docs.where(F.col("doc_id") % 2 == 1)
        dedup.write_prefix_index(corpus, tbl, n_buckets=8, k=3,
                                 threshold=0.5, path=os.path.join(base, "pfx"))
        out = dedup.incremental_prefix_pairs_indexed(
            batch, tbl, k=3, threshold=0.5)
        return out.localCheckpoint()  # materialize before the DROP below
    finally:
        for s in ("prefix", "df", "sets"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}_{s}")
        shutil.rmtree(base, ignore_errors=True)


def q_incremental_minhash_pairs_indexed(
        spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED MinHash-LSH index end-to-end (VERDICT r5 #1),
    emitted as the driver-checkable recall invariant (the
    incremental_minhash_recall trick): the corpus signature/band tables
    are written bucketed on the candidate join key (seed = doc_id % 4 ==
    0, survivors folded in by append_to_minhash_index = % 4 == 2), so the
    per-ingest candidate join reads the corpus side exchange-free and
    only the batch (odd doc_ids) is shingled and shuffled
    (operators/dedup.py::incremental_minhash_pairs_indexed). Output rows
    are the exact batch x corpus Jaccard truth at >= 0.5, each carrying
    ``lsh_found`` from the indexed path at its 0.3 operating threshold;
    the oracle asserts TRUE per pair (theory + measured misses as in
    q_incremental_minhash_recall)."""
    import os
    import shutil
    import tempfile

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    base = tempfile.mkdtemp(prefix="sg_mhidx_")
    tbl = os.path.basename(base).lower()
    try:
        seed = docs.where(F.col("doc_id") % 4 == 0)
        extra = docs.where(F.col("doc_id") % 4 == 2)
        corpus = docs.where(F.col("doc_id") % 2 == 0)
        batch = docs.where(F.col("doc_id") % 2 == 1)
        dedup.write_minhash_index(seed, tbl, n_buckets=8,
                                  path=os.path.join(base, "mh"))
        dedup.append_to_minhash_index(extra, tbl)
        truth = dedup.incremental_ngram_pairs(
            batch, corpus, k=3, threshold=0.5, hash_shingles=True
        ).select("batch_id", "corpus_id", "jaccard")
        cands = dedup.incremental_minhash_pairs_indexed(
            batch, tbl, threshold=0.3
        ).select("batch_id", "corpus_id", F.lit(True).alias("_f"))
        out = (
            truth.join(cands, ["batch_id", "corpus_id"], "left")
            .select("batch_id", "corpus_id", "jaccard",
                    F.coalesce("_f", F.lit(False)).alias("lsh_found"))
        )
        return out.localCheckpoint()  # materialize before the DROP below
    finally:
        for s in ("bands", "sig"):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}_{s}")
        shutil.rmtree(base, ignore_errors=True)


def q_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-versioning diff (operators/curation.py::corpus_diff): two
    snapshots derived deterministically from the documents table (old =
    ids % 3 != 0; new = ids % 4 != 0 with ids % 5 == 0 rewritten),
    classified added/removed/changed/unchanged by content hash — the
    release-audit step. Hash-only shuffle: ~48 bytes per doc regardless
    of document size."""
    from data_cube_spark.operators.curation import corpus_diff

    docs = load_tables(spark, sf_dir)["documents"]
    old = docs.where(F.col("doc_id") % 3 != 0)
    new = docs.where(F.col("doc_id") % 4 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text")))
    return corpus_diff(old, new)
