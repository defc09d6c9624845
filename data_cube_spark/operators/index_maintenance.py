"""Unified maintenance surface for the persisted incremental-dedup /
ANN index family (VERDICT r6 #7, wired for drift/skew in r9).

Five index kinds share one operational contract — bucketed catalog
tables stamped with ``spark_graft.index.*`` TBLPROPERTIES, read paths
that refuse parameter mismatches, idempotent-by-compaction appends —
but each grew its own write/append/compact helpers. This module is the
thin fleet-management layer over the stamped metadata:

- :func:`list_indexes` enumerates every index in the catalog (kind,
  member tables, stamped parameters, row counts) by recognizing the
  kind-specific table suffixes and their properties, and surfaces a
  per-index ``health`` dict computed from the stamped drift/skew
  counters (``needs_rebuild`` for the frozen-order prefix index past
  :data:`~data_cube_spark.operators.dedup.PREFIX_DF_DRIFT_BOUND`,
  ``needs_retrain`` for IVF past
  :data:`~data_cube_spark.operators.similarity.IVF_SKEW_BOUND`);
- :func:`compact_all` runs each index's own compaction helper in one
  sweep — the "nightly cadence" entry point — and returns (plus
  ``warnings.warn``-s) one warning per index whose health flags a
  rebuild/retrain, so the nightly job is also the drift monitor.

Refresh cadence contract (per kind):

===========  ======  =======  ==================================
kind         append  compact  refresh
===========  ======  =======  ==================================
fingerprint  yes     yes      compact only
minhash      yes     yes      compact only
prefix       yes     yes      compact on the nightly cadence;
                              REBUILD (``write_prefix_index``)
                              when ``health.needs_rebuild`` —
                              appends reuse the FROZEN rarest-
                              first shingle order (still EXACT),
                              but pruning efficiency drifts as
                              true document frequencies diverge
                              from the frozen ranking
embedding    yes     yes      compact; REBUILD when the occupancy
                              guard would raise planes (the write
                              path re-sizes tables for the stamped
                              recall floor)
ivf          yes     yes      compact + RETRAIN
                              (``write_ivf_index``) when
                              ``health.needs_retrain`` — centroids
                              stay fixed between refreshes, so
                              cell balance drifts as the corpus
                              grows (costs recall, never
                              correctness)
===========  ======  =======  ==================================

Concurrency contract (VERDICT r9 #5): maintenance is SINGLE-WRITER per
index — run one append or compaction at a time (the nightly sweep and
the ingest appender must not overlap on the same index). The contract
is FENCED, not merely assumed: every append advances a stamped
``maintenance_epoch``, and every compaction snapshots it, materializes
the deduplicated rows, then re-checks the epoch before overwriting —
an interleaved append makes the compaction fail loudly (retry remedy
in the message) instead of silently dropping the appended rows.
Readers are unaffected: reads never take part in the fence and are
safe concurrent with appends (appends are insert-only).

Greenfield vs the reference (SURVEY §2.10): data.cube persists no
indexes; this is the operational half of the north-star dedup/ANN
surface.
"""

from __future__ import annotations

import warnings as _warnings


#: kind -> (recognizing suffixes, append/compact capability). The FIRST
#: suffix names the table whose properties are authoritative for the
#: kind (every member is stamped, but one probe per index suffices).
INDEX_KINDS: dict[str, dict] = {
    "fingerprint": {"suffixes": ("_fp",), "append": True, "compact": True},
    "minhash": {"suffixes": ("_sig", "_bands"), "append": True,
                "compact": True},
    "prefix": {"suffixes": ("_prefix", "_df", "_sets"), "append": True,
               "compact": True},
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


def _health(kind: str, params: dict) -> dict:
    """Per-index health from the STAMPED counters only (no table scans
    — listing stays a metadata operation). Prefix: df-order drift vs
    PREFIX_DF_DRIFT_BOUND -> needs_rebuild. IVF: cell-occupancy skew vs
    IVF_SKEW_BOUND -> needs_retrain. None-valued metrics mean the index
    predates the counters (rebuild/retrain to stamp them)."""
    from data_cube_spark.operators.dedup import (
        PREFIX_DF_DRIFT_BOUND,
        prefix_df_drift,
    )
    from data_cube_spark.operators.similarity import (
        IVF_SKEW_BOUND,
        ivf_cell_skew,
    )

    from data_cube_spark.operators.dedup import INDEX_FORMAT_VERSION

    h: dict = {"needs_rebuild": False, "needs_retrain": False}
    # format version rides along on every kind (VERDICT r9 #3): None =
    # pre-versioning index (still readable); too_new = written by a
    # NEWER library — read/append/compact paths refuse it, and the
    # listing surfaces the refusal reason instead of hiding the index
    try:
        h["format_version"] = int(params["format_version"])
    except (KeyError, ValueError):
        h["format_version"] = None
    h["format_too_new"] = bool(
        h["format_version"] is not None
        and h["format_version"] > INDEX_FORMAT_VERSION)
    if kind == "prefix":
        drift = prefix_df_drift(params)
        h["df_drift"] = drift
        h["df_drift_bound"] = PREFIX_DF_DRIFT_BOUND
        h["needs_rebuild"] = bool(drift is not None
                                  and drift > PREFIX_DF_DRIFT_BOUND)
        # the DIRECT staleness measure: share of appended posting mass
        # whose shingle the frozen order has never seen (df ranked 0)
        try:
            ap = int(params["appended_postings"])
            h["unseen_ratio"] = (int(params["unseen_postings"]) / ap
                                 if ap > 0 else 0.0)
        except (KeyError, ValueError):
            h["unseen_ratio"] = None
    elif kind == "ivf":
        skew = ivf_cell_skew(params)
        h["cell_skew"] = skew
        h["cell_skew_bound"] = IVF_SKEW_BOUND
        h["needs_retrain"] = bool(skew is not None and skew > IVF_SKEW_BOUND)
    elif kind == "embedding":
        # the stamped recall floor story rides along (reads already
        # refuse a below-floor geometry; this is the fleet view of it)
        try:
            h["predicted_recall"] = float(params["predicted_recall"])
        except (KeyError, ValueError):
            h["predicted_recall"] = None
    return h


def attach_indexes(spark, warehouse: str | None = None,
                   prefix: str | None = None) -> list[str]:
    """Re-register persisted index tables from their on-disk sidecars
    (VERDICT r10 #6): with the default in-memory catalog a fresh
    SparkSession starts empty, so the nightly fleet sweep would only
    ever see indexes created in its own session. Every metadata stamp
    writes a ``_spark_graft_index.json`` sidecar (schema, bucketing
    spec, location, properties) into the table directory; this scans
    ``warehouse`` (default: the session's ``spark.sql.warehouse.dir``)
    for sidecars and ``CREATE TABLE ... USING PARQUET CLUSTERED BY ...
    LOCATION ...`` + ``SET TBLPROPERTIES`` each table the catalog does
    not already have — bucketing spec included, so the re-attached
    read/append/compact plans keep the exchange-free corpus side.
    Local-filesystem warehouses only (the metastore-less single-box /
    single-mount case); a shared deployment should run a Hive
    metastore, where the catalog is already cross-session and this is
    a no-op. Returns the table names attached."""
    import json
    import os

    wh = warehouse or spark.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
    if not wh or not os.path.isdir(wh):
        return []
    attached: list[str] = []
    for entry in sorted(os.listdir(wh)):
        sidecar = os.path.join(wh, entry, "_spark_graft_index.json")
        if not os.path.isfile(sidecar):
            continue
        try:
            with open(sidecar) as fh:
                doc = json.load(fh)
        except (OSError, ValueError):
            continue
        t = doc.get("table")
        if not t or (prefix is not None and not t.startswith(prefix)):
            continue
        if spark.catalog.tableExists(t):
            continue
        ddl = f"CREATE TABLE {t} ({doc['schema_ddl']}) USING PARQUET"
        if doc.get("num_buckets") and doc.get("bucket_columns"):
            cols = ", ".join(f"`{c}`" for c in doc["bucket_columns"])
            ddl += f" CLUSTERED BY ({cols})"
            if doc.get("sort_columns"):
                scols = ", ".join(f"`{c}`" for c in doc["sort_columns"])
                ddl += f" SORTED BY ({scols})"
            ddl += f" INTO {int(doc['num_buckets'])} BUCKETS"
        ddl += f" LOCATION '{doc['location']}'"
        spark.sql(ddl)
        props = doc.get("properties") or {}
        if props:
            kv = ", ".join(f"'{k}'='{v}'" for k, v in props.items())
            spark.sql(f"ALTER TABLE {t} SET TBLPROPERTIES ({kv})")
        attached.append(t)
    return attached


def list_indexes(spark, prefix: str | None = None,
                 warehouse: str | bool | None = None) -> list[dict]:
    """Enumerate the persisted indexes in the current database by their
    stamped ``spark_graft.index.*`` properties. Returns one dict per
    index: ``name`` (base), ``kind``, ``tables`` (member catalog
    tables), ``params`` (stamped metadata of the kind's authoritative
    member), ``appendable``/``compactable`` (the cadence contract),
    ``complete`` (every expected member table present — a False here
    means a partial write or manual drop and the index must be
    rebuilt), and ``health`` — the drift/skew flags the append paths
    stamp (``needs_rebuild`` for prefix df-order drift past
    ``PREFIX_DF_DRIFT_BOUND``, ``needs_retrain`` for IVF cell skew past
    ``IVF_SKEW_BOUND``; both computed from metadata alone, no scans).
    ``prefix`` filters by base-name prefix. Metadata-less tables that
    merely share a suffix are ignored — the stamp IS the membership
    test, exactly as on the read paths.

    ``warehouse`` widens the listing beyond the live session's catalog
    (VERDICT r10 #6): ``True`` first re-attaches every sidecar index
    found under the session's ``spark.sql.warehouse.dir``, a string
    does the same for that directory — so a FRESH session's nightly
    sweep sees indexes created by other sessions. ``None`` (default)
    keeps the metadata-only catalog listing."""
    from data_cube_spark.operators.dedup import _index_meta

    if warehouse:
        attach_indexes(spark,
                       None if warehouse is True else warehouse, prefix)
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
        params = (_index_meta(spark, base + spec["suffixes"][0])
                  if base + spec["suffixes"][0] in tables else {})
        out.append({
            "name": base,
            "kind": kind,
            "tables": sorted(tables),
            "params": params,
            "appendable": spec["append"],
            "compactable": spec["compact"],
            "complete": tables == expected,
            "health": _health(kind, params),
        })
    return out


def compact_all(spark, prefix: str | None = None,
                warehouse: str | bool | None = None,
                refreeze_prefix: bool = False) -> dict:
    """Run every compactable index's own in-place compaction (the
    nightly-cadence sweep): re-distincts each member table preserving
    bucketing, location and metadata, exactly as the per-kind helpers
    do — this simply dispatches to them. Returns ``{"removed": {index
    name: duplicate rows removed}, "warnings": [str, ...]}`` — one
    warning (also raised via :mod:`warnings`) per index whose stamped
    health flags a rebuild (prefix df-order drift past
    ``PREFIX_DF_DRIFT_BOUND``) or retrain (IVF cell skew past
    ``IVF_SKEW_BOUND``), making the nightly sweep the drift monitor
    the append docstrings promise. Health is recomputed from the
    POST-compaction metadata (compaction re-stamps the counters when it
    removes duplicate rows), so the warnings reflect the state the
    sweep leaves behind, not the one it found. Incomplete indexes are
    skipped — compacting a partial index would bless a broken state —
    and a per-index consistency failure (``check_member_sync``) is
    surfaced as a warning and skipped rather than aborting the sweep,
    so one half-appended index never leaves the rest uncompacted. An
    epoch-fence conflict (an append interleaved with the compaction's
    materialization) is retried ONCE within the sweep — its error text
    says "retry the compaction", and the sweep is the party positioned
    to honor that (ADVICE r10); only a second conflict is downgraded
    to a warning. ``warehouse`` (``True`` or a directory) first
    re-attaches sidecar indexes from disk so a fresh session's nightly
    sweep covers the fleet, not just its own catalog (VERDICT r10 #6,
    via :func:`attach_indexes`).

    ``refreeze_prefix=True`` turns the monitor into the operator for
    prefix indexes (r13): instead of WARNING that a drifted index needs
    its order re-frozen, the sweep runs
    :func:`~data_cube_spark.operators.dedup.refreeze_prefix_index`
    right there — the re-freeze needs only the index's own ``_sets``
    member, so the nightly job can do it without the ingest pipeline's
    raw inputs. Re-frozen indexes are reported under ``"refrozen"``
    ({name: new order_version}) instead of warned about; a re-freeze
    that loses the single-writer race is downgraded to the warning
    path (same contract as a conflicted compaction)."""
    from data_cube_spark.operators import similarity
    from data_cube_spark.operators.dedup import (
        compact_fingerprint_index,
        compact_minhash_index,
        compact_prefix_index,
    )

    dispatch = {
        "fingerprint": compact_fingerprint_index,
        "minhash": compact_minhash_index,
        "prefix": compact_prefix_index,
        "embedding": similarity.compact_embedding_index,
        "ivf": similarity.compact_ivf_index,
    }
    from data_cube_spark.operators.dedup import _index_meta

    removed: dict[str, int] = {}
    refrozen: dict[str, str] = {}
    warns: list[str] = []
    for idx in list_indexes(spark, prefix, warehouse=warehouse):
        if not idx["compactable"] or not idx["complete"]:
            continue
        try:
            removed[idx["name"]] = dispatch[idx["kind"]](spark, idx["name"])
        except ValueError as exc:
            if "maintenance_epoch" in str(exc):
                # ADVICE r10: the epoch-fence conflict says "retry the
                # compaction" — an append interleaved and has finished
                # stamping by now, so one in-sweep retry usually lands;
                # only a SECOND conflict is downgraded to the warning.
                try:
                    removed[idx["name"]] = dispatch[idx["kind"]](
                        spark, idx["name"])
                    continue
                except ValueError as exc2:
                    exc = exc2
            # One half-appended index (member-sync violation) or a
            # twice-conflicted compaction must not abort the fleet
            # sweep — surface it and keep compacting the rest, so the
            # nightly job still monitors every index.
            warns.append(
                f"{idx['name']} ({idx['kind']}): compaction skipped — "
                f"{exc}")
            continue
        # Health is re-evaluated from FRESH metadata: compact_prefix_/
        # compact_ivf_index re-stamp the drift/skew counters when
        # removing duplicate-inflated rows, so the pre-sweep snapshot in
        # idx['health'] may demand a rebuild the compaction just
        # resolved (or miss a skew that only crossed the bound after
        # dedup).
        spec = INDEX_KINDS[idx["kind"]]
        h = _health(idx["kind"],
                    _index_meta(spark, idx["name"] + spec["suffixes"][0]))
        if h.get("needs_rebuild") and refreeze_prefix:
            from data_cube_spark.operators.dedup import (
                refreeze_prefix_index,
            )

            try:
                res = refreeze_prefix_index(spark, idx["name"])
            except ValueError as exc:
                warns.append(
                    f"{idx['name']} ({idx['kind']}): re-freeze skipped — "
                    f"{exc}")
            else:
                refrozen[idx["name"]] = res["order_version"]
                h = _health(idx["kind"], _index_meta(
                    spark, idx["name"] + spec["suffixes"][0]))
        if h.get("needs_rebuild"):
            warns.append(
                f"{idx['name']} ({idx['kind']}): frozen shingle-order drift "
                f"{h['df_drift']:.3f} exceeds {h['df_drift_bound']} — "
                f"candidate pruning is degrading; rebuild with "
                f"write_prefix_index to re-freeze the order.")
        if h.get("needs_retrain"):
            warns.append(
                f"{idx['name']} ({idx['kind']}): cell-occupancy skew "
                f"{h['cell_skew']:.3f} exceeds {h['cell_skew_bound']} — "
                f"recall at fixed n_probe is degrading; retrain with "
                f"write_ivf_index.")
    for w in warns:
        _warnings.warn(w, stacklevel=2)
    return {"removed": removed, "refrozen": refrozen, "warnings": warns}
