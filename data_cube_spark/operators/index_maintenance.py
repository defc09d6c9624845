"""Unified maintenance surface for the persisted incremental-dedup /
ANN index family (VERDICT r6 #7).

Five index kinds share one operational contract — bucketed catalog
tables stamped with ``spark_graft.index.*`` TBLPROPERTIES, read paths
that refuse parameter mismatches, idempotent-by-compaction appends —
but each grew its own write/append/compact helpers. This module is the
thin fleet-management layer over the stamped metadata:

- :func:`list_indexes` enumerates every index in the catalog (kind,
  member tables, stamped parameters, row counts) by recognizing the
  kind-specific table suffixes and their properties;
- :func:`compact_all` runs each index's own compaction helper in one
  sweep — the "nightly cadence" entry point.

Refresh cadence contract (per kind):

===========  ======  =======  ==================================
kind         append  compact  refresh
===========  ======  =======  ==================================
fingerprint  yes     yes      compact only
minhash      yes     yes      compact only
prefix       no      no       REBUILD (``write_prefix_index``) —
                              the rarest-first global shingle
                              order bakes corpus document
                              frequencies into the stored prefixes
embedding    yes     yes      compact; REBUILD when the occupancy
                              guard would raise planes (the write
                              path re-sizes tables for the stamped
                              recall floor)
ivf          yes     yes      compact + RETRAIN
                              (``write_ivf_index``) — centroids
                              stay fixed between refreshes, so
                              cell balance drifts as the corpus
                              grows (costs recall, never
                              correctness)
===========  ======  =======  ==================================

Greenfield vs the reference (SURVEY §2.10): data.cube persists no
indexes; this is the operational half of the north-star dedup/ANN
surface.
"""

from __future__ import annotations


#: kind -> (recognizing suffixes, append/compact capability). The FIRST
#: suffix names the table whose properties are authoritative for the
#: kind (every member is stamped, but one probe per index suffices).
INDEX_KINDS: dict[str, dict] = {
    "fingerprint": {"suffixes": ("_fp",), "append": True, "compact": True},
    "minhash": {"suffixes": ("_sig", "_bands"), "append": True,
                "compact": True},
    "prefix": {"suffixes": ("_prefix", "_df", "_sets"), "append": False,
               "compact": False},
    "embedding": {"suffixes": ("_buckets", "_vec"), "append": True,
                  "compact": True},
    "ivf": {"suffixes": ("_cells", "_centroids"), "append": True,
            "compact": True},
}


def _classify(name: str) -> tuple[str, str] | None:
    """(kind, base index name) for a catalog table name, or None.
    Longest-suffix match first so ``_prefix`` is never shadowed."""
    best = None
    for kind, spec in INDEX_KINDS.items():
        for suf in spec["suffixes"]:
            if name.endswith(suf) and len(name) > len(suf):
                if best is None or len(suf) > len(best[2]):
                    best = (kind, name[: -len(suf)], suf)
    return None if best is None else (best[0], best[1])


def list_indexes(spark, prefix: str | None = None) -> list[dict]:
    """Enumerate the persisted indexes in the current database by their
    stamped ``spark_graft.index.*`` properties. Returns one dict per
    index: ``name`` (base), ``kind``, ``tables`` (member catalog
    tables), ``params`` (stamped metadata of the kind's authoritative
    member), ``appendable``/``compactable`` (the cadence contract), and
    ``complete`` (every expected member table present — a False here
    means a partial write or manual drop and the index must be
    rebuilt). ``prefix`` filters by base-name prefix. Metadata-less
    tables that merely share a suffix are ignored — the stamp IS the
    membership test, exactly as on the read paths."""
    from data_cube_spark.operators.dedup import _index_meta

    found: dict[tuple[str, str], set[str]] = {}
    for t in spark.catalog.listTables():
        if getattr(t, "isTemporary", False):
            continue
        cls = _classify(t.name)
        if cls is None:
            continue
        kind, base = cls
        if prefix is not None and not base.startswith(prefix):
            continue
        if not _index_meta(spark, t.name):
            continue  # suffix coincidence, not one of ours
        found.setdefault((kind, base), set()).add(t.name)
    out = []
    for (kind, base), tables in sorted(found.items(),
                                       key=lambda kv: (kv[0][1], kv[0][0])):
        spec = INDEX_KINDS[kind]
        expected = {base + suf for suf in spec["suffixes"]}
        out.append({
            "name": base,
            "kind": kind,
            "tables": sorted(tables),
            "params": _index_meta(spark, base + spec["suffixes"][0])
            if base + spec["suffixes"][0] in tables else {},
            "appendable": spec["append"],
            "compactable": spec["compact"],
            "complete": tables == expected,
        })
    return out


def compact_all(spark, prefix: str | None = None) -> dict[str, int]:
    """Run every compactable index's own in-place compaction (the
    nightly-cadence sweep): re-distincts each member table preserving
    bucketing, location and metadata, exactly as the per-kind helpers
    do — this simply dispatches to them. Returns {index name: duplicate
    rows removed}; rebuild-only kinds (prefix) and incomplete indexes
    are skipped — compacting a partial index would bless a broken
    state."""
    from data_cube_spark.operators import similarity
    from data_cube_spark.operators.dedup import (
        compact_fingerprint_index,
        compact_minhash_index,
    )

    dispatch = {
        "fingerprint": compact_fingerprint_index,
        "minhash": compact_minhash_index,
        "embedding": similarity.compact_embedding_index,
        "ivf": similarity.compact_ivf_index,
    }
    removed: dict[str, int] = {}
    for idx in list_indexes(spark, prefix):
        if not idx["compactable"] or not idx["complete"]:
            continue
        removed[idx["name"]] = dispatch[idx["kind"]](spark, idx["name"])
    return removed
