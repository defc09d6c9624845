"""Query-spec selector objects — the explicit replacement for the reference's
R non-standard-evaluation query syntax.

The reference parses ``dc[product="Mazda RX4", time=`-`(time_year=2014L)]``
with an NSE parser (``parse.dots``, reference R/data.cube.R:121-227) that
decodes operator prefixes ``.`` (select) ``-`` (collapse) ``+`` (rollup)
``^`` (cube) and normalizes values/filters. We replace that with plain
Python objects, so the "IR" of a query is inspectable and serializable:

    dc.q(part=C("..."),                      # dice by key values
         supplier={"n_name": ["FRANCE"]},    # dice by hierarchy attribute
         orders=Collapse(o_orderpriority="1-URGENT"),  # pre-filter + collapse
         part=5)                             # scalar => slice (dim dropped)

Selector semantics mirror reference R/data.cube.R:162-227 + 264-281:
- scalar key value      -> slice: filter to one member, DROP the dimension
- list of key values    -> dice: filter, keep the dimension
- mapping field->values -> dice by attributes at any hierarchy level
- Collapse(...)         -> optional pre-filter, then collapse (aggregate out)
- RollupOp / CubeOp     -> grouping-sets over the dimension's hierarchy keys
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass, field
from typing import Any

#: operator codes matching the reference's prefixes (R/data.cube.R:162-169)
OP_SELECT = "."
OP_COLLAPSE = "-"
OP_ROLLUP = "+"
OP_CUBE = "^"

_SCALARS = (str, bytes, int, float, bool)


def _is_scalar(v: Any) -> bool:
    return isinstance(v, _SCALARS) or hasattr(v, "isoformat")  # date/datetime


def _is_df(v: Any) -> bool:
    # duck-typed so this module stays import-light; a DataFrame-valued filter
    # is the reference's keyed-semi-join mode (b) (R/level.R:31-45)
    return hasattr(v, "sparkSession") and hasattr(v, "columns")


def _coerce(v: Any):
    if _is_df(v) or isinstance(v, Range):
        return v
    return [v] if _is_scalar(v) else list(v)


@dataclass(frozen=True)
class Range:
    """Half-open (by default) range predicate for an attribute filter:
    ``C(o_orderdate=Range(hi="1998-01-01"))`` dices by ``< hi`` structurally
    — the bound reaches the dimension scan as a pushed comparison filter
    instead of relying on the optimizer to push a post-aggregation WHERE
    through (the membership-only selector gap noted for tpch_q3).

    ``lo``/``hi`` may each be None (one-sided). Inclusivity flags default to
    the SQL-conventional closed-open ``[lo, hi)``."""

    lo: Any = None
    hi: Any = None
    lo_incl: bool = True
    hi_incl: bool = False

    def __post_init__(self) -> None:
        if self.lo is None and self.hi is None:
            raise ValueError("Range needs at least one bound")


@dataclass
class Selector:
    """Normalized per-dimension query op.

    ``values``  — key-member dice values (pushed down as ``isin`` literals).
    ``filters`` — {field: [values]} attribute filters resolved through the
                  dimension's field->level routing (reference R/dimension.R:64-93).
    ``or_filters`` — list of alternative filter dicts, OR-combined (each
                  dict is AND-combined internally) — the OR semantics the
                  reference notes as unsupported (R/dimension.R:81).
    ``drop``    — scalar-key slice => drop the dimension after filtering
                  (reference R/data.cube.R:264-272: scalar selectors drop,
                  multi-value selectors never drop).
    """

    op: str = OP_SELECT
    values: list | None = None
    filters: dict[str, list] = field(default_factory=dict)
    or_filters: list[dict] = field(default_factory=list)
    drop: bool = False
    hierarchy: str | None = None  # which hierarchy RollupOp/CubeOp groups by

    def as_filters(self, key: str) -> dict[str, list]:
        """Merge key-values and attribute filters into one field->values map."""
        out: dict[str, list] = {}
        if self.values is not None:
            out[key] = (self.values
                        if _is_df(self.values) or isinstance(self.values, Range)
                        else list(self.values))
        for f, v in self.filters.items():
            out[f] = _coerce(v)
        return out

    @property
    def has_filter(self) -> bool:
        return self.values is not None or bool(self.filters) or bool(self.or_filters)

    def collapsed(self) -> "Selector":
        """Copy with the collapse op — composes with ``AnyOf``:
        ``q(dim=AnyOf(a, b).collapsed())`` pre-filters by the OR predicate,
        then aggregates the dimension out."""
        return Selector(op=OP_COLLAPSE, values=self.values,
                        filters=dict(self.filters),
                        or_filters=[dict(d) for d in self.or_filters],
                        drop=False)


def normalize(sel: Any, *, empty_ok: bool = True) -> Selector:
    """Coerce user input into a Selector (reference parse.dots value rules)."""
    if isinstance(sel, Selector):
        return sel
    if sel is None:
        # dc[NULL] -> empty dice: matches nothing (reference
        # tests/tests-sub-.data.cube.R:83-97)
        return Selector(values=[])
    if _is_df(sel):
        # table-valued dice: semi-join the dimension key against the frame
        return Selector(values=sel)
    if isinstance(sel, Range):
        # bare Range: range-dice on the dimension KEY
        return Selector(values=sel)
    if _is_scalar(sel):
        return Selector(values=[sel], drop=True)
    if isinstance(sel, Mapping):
        return Selector(filters={k: _coerce(v) for k, v in sel.items()})
    if isinstance(sel, (list, tuple, set, frozenset)) or hasattr(sel, "__iter__"):
        return Selector(values=list(sel))
    raise TypeError(f"cannot interpret selector {sel!r}")


def AnyOf(*alternatives: Mapping[str, Any]) -> Selector:
    """OR-combination of attribute filter sets: the dimension keeps members
    matching ANY alternative (each alternative dict is AND-combined
    internally) — implements the OR semantics the reference documents as
    unsupported (R/dimension.R:81). Executed as a union of the
    per-alternative broadcast-filtered bases, deduped by key."""
    return Selector(or_filters=[
        {k: _coerce(v) for k, v in alt.items()} for alt in alternatives
    ])


def C(*values: Any, **filters: Any) -> Selector:
    """Dice: ``C(v1, v2)`` filters the key, ``C(attr=[...])`` filters any
    hierarchy attribute. Single positional value still keeps the dimension
    (use a bare scalar in ``q()`` for slice-and-drop)."""
    sel = Selector()
    if len(values) == 1 and (_is_df(values[0]) or isinstance(values[0], Range)):
        sel.values = values[0]
    elif values:
        sel.values = list(values)
    for f, v in filters.items():
        sel.filters[f] = _coerce(v)
    return sel


def Collapse(*values: Any, **filters: Any) -> Selector:
    """Collapse the dimension (aggregate it out), optionally pre-filtering it
    first — reference ``-`` op, R/data.cube.R:167 + R/fact.R:87-98; semantics
    tests/tests-sub-.data.cube.R:310-354 (filter applies BEFORE collapse)."""
    sel = C(*values, **filters)
    sel.op = OP_COLLAPSE
    return sel


def RollupOp(*values: Any, hierarchy: str | None = None, **filters: Any) -> Selector:
    """Rollup grouping-sets over this dimension's hierarchy level keys —
    reference ``+`` op (parsed at R/data.cube.R:168, exec unfinished there;
    we implement the intended semantics via Spark ``rollup``).
    ``hierarchy`` selects which of a multi-hierarchy dimension's hierarchies
    to group by (default: the first declared)."""
    sel = C(*values, **filters)
    sel.op = OP_ROLLUP
    sel.hierarchy = hierarchy
    return sel


def CubeOp(*values: Any, hierarchy: str | None = None, **filters: Any) -> Selector:
    """Full cube grouping-sets over this dimension — reference ``^`` op."""
    sel = C(*values, **filters)
    sel.op = OP_CUBE
    sel.hierarchy = hierarchy
    return sel
