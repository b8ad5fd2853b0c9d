"""EAV obs-value codec: typed-value coalesce, ordered blob packing, map codec.

Re-expresses the reference's signature operations:

* typed-value CASE cascade (flat_obs_v1.0.sql:124-132): exactly one of seven
  typed value columns is non-null per obs row; priority coded > numeric >
  date(datetime) > boolean > text > drug > modifier.
* ordered GROUP_CONCAT blob (flat_obs_v1.0.sql:123-144):
  ``!!<concept_id>=<value>!! ## ...`` sorted by (concept_id, value_coded).
  Spark's ``collect_list`` is order-nondeterministic, so determinism comes
  from ``array_sort`` over structs whose leading fields are the sort key —
  this is the one place a naive translation silently diverges (SURVEY §7.4.1).
* blob membership / extraction (flat_visit_summary_v1.0.sql:202,212): the
  engine's canonical form is a MapType(int -> array<string>) column, so
  membership is ``map_contains_key`` and extraction is ``element_at`` —
  both Catalyst-native — with regex helpers kept for legacy-blob mode.

Everything here is built-in ``pyspark.sql.functions`` composition: zero
Python UDFs, so the whole layer stays inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from mrsboraetl_spark.config import BLOB_BOUNDARY, BLOB_SEP

__all__ = [
    "render_numeric",
    "typed_value",
    "blob_entry",
    "ordered_collect",
    "packed_blob",
    "obs_map_from_entries",
    "render_legacy_blob",
    "blob_contains",
    "blob_extract_all",
    "map_first_value",
]


def render_numeric(col: Column) -> Column:
    """Render a double the way MySQL prints it in the blob: shortest
    round-trip digits, plain decimal, no trailing zeros, no trailing dot
    (``72.0`` -> ``72``, ``72.50`` -> ``72.5``).

    Mirrors the implicit cast inside CONCAT at flat_obs_v1.0.sql:125-126.

    Contract range: |x| in [1e-4, 9.9e14] plus 0 — the plain-decimal
    window MySQL and DuckDB share (clinical obs values live far inside
    it; above ~1e15 DuckDB's own formatter stops being shortest-repr).
    Spark's double->string cast switches to Java E-notation already at
    1e7 (``1.23456789E7``) and below 1e-3 (``1.0E-4``), so inside the
    contract window the E-form is expanded back to plain decimal with
    string ops (shift the point by the exponent, preserving the shortest
    mantissa digits exactly — a DECIMAL cast would instead expose the
    double's full binary expansion, 12345678.9 -> ...90000000037252903).
    ``-0.0`` renders ``-0`` (MySQL and DuckDB agree).  Outside the window
    both engines print scientific notation with engine-specific
    formatting; callers there are outside reference behavior
    (property-tested in tests/test_properties).
    """
    s = col.cast("string")
    sign = F.regexp_extract(s, r"^(-?)", 1)
    mant_int = F.regexp_extract(s, r"^-?(\d)\.", 1)
    frac = F.regexp_extract(s, r"^-?\d\.(\d+)E", 1)
    exp = F.regexp_extract(s, r"E(-?\d+)$", 1).cast("int")
    frac_len = F.length(frac)
    # frac with trailing shortest-repr zero dropped when it IS just "0"
    frac_digits = F.when(frac == "0", F.lit("")).otherwise(frac)
    pos_big = F.concat(
        sign,
        mant_int,
        frac_digits,
        F.repeat(F.lit("0"), exp - F.length(frac_digits)),
    )
    head = frac.substr(F.lit(1), exp)
    tail = frac.substr(exp + 1, F.length(frac))
    pos_split = F.concat(sign, mant_int, head, F.lit("."), tail)
    neg_exp = F.concat(
        sign,
        F.lit("0."),
        F.repeat(F.lit("0"), -exp - 1),
        mant_int,
        frac_digits,
    )
    expanded = (
        F.when(exp >= frac_len, pos_big)
        .when(exp >= 1, pos_split)
        .otherwise(neg_exp)
    )
    # Fast paths (r13, guide §1.2 "per-task work"): this expression runs
    # once per obs row inside the blob aggregates, and the three regex
    # ops below were ~all of its cost on the (overwhelmingly common)
    # plain-decimal path.  Both rewrites are exact over every string a
    # double cast can produce:
    # * the E-notation gate: Java's Double.toString emits 'E' if and
    #   only if the value is in scientific form (and 'NaN'/'Infinity'
    #   contain no 'E'), so contains('E') == rlike('E-?\\d+$') here;
    # * trailing-zero strip: shortest-round-trip mantissas never carry
    #   redundant trailing zeros, so on the plain path the ONLY string
    #   the old regexp_replace pair ever changed is the integral
    #   'x.0' -> 'x' (and the E-expansions above are built from those
    #   same shortest mantissas: pos_big has no dot, pos_split's tail
    #   and neg_exp's last digit are the mantissa's final nonzero
    #   digit) — one endswith + substr replaces both regex passes.
    #   Byte-equality with the regex spelling is pinned in
    #   tests/test_properties.py.
    s = F.when(s.contains("E"), expanded).otherwise(s)
    return F.when(
        s.endswith(".0"), s.substr(F.lit(1), F.length(s) - 2)
    ).otherwise(s)


def typed_value(qualifier: str = "") -> Column:
    """Priority coalesce over the seven EAV value columns, rendered to string.

    flat_obs_v1.0.sql:124-132: CASE WHEN value_coded THEN value_coded WHEN
    value_numeric ... — coded > numeric > date(datetime) > boolean > text >
    drug > modifier.
    """
    q = f"{qualifier}." if qualifier else ""
    c = lambda n: F.col(f"{q}{n}")  # noqa: E731
    return F.coalesce(
        c("value_coded").cast("string"),
        render_numeric(c("value_numeric")),
        F.date_format(c("value_datetime"), "yyyy-MM-dd"),
        c("value_boolean").cast("string"),
        c("value_text"),
        c("value_drug").cast("string"),
        c("value_modifier"),
    )


def blob_entry(key: Column, value: Column) -> Column:
    """``!!<key>=<value>!!`` — NULL value propagates to a NULL entry, which
    both MySQL GROUP_CONCAT and our ``array_join`` silently drop.

    flat_obs_v1.0.sql:125: concat(@boundary, concept_id, '=', value, @boundary).
    """
    b = F.lit(BLOB_BOUNDARY)
    return F.concat(b, key.cast("string"), F.lit("="), value, b)


def ordered_collect(
    entry: Column | None,
    order_by: Sequence[Column],
    distinct: bool = False,
    entry_of=None,
) -> Column:
    """Aggregate expression: collect ``entry`` per group, deterministically
    ordered by ``order_by`` (NULLs first, like MySQL ASC), as array<string>.

    The GROUP_CONCAT(... ORDER BY ...) core (flat_obs_v1.0.sql:133).
    ``distinct=True`` dedups the *rendered string* after ordering, matching
    MySQL's GROUP_CONCAT(DISTINCT ...) at flat_lab_obs_v1.0.sql:109-121.

    ``entry_of`` (r13, guide §2.3 "shuffle keys and metadata instead of
    payloads"): when the rendered entry is a pure function of the
    ``order_by`` key tuple — the blob norm: ``!!k=render(v)!!`` over sort
    keys (k, v) — pass a callable building it from the sorted struct
    (fields ``_k0.._kn``) and leave ``entry=None``.  The collect buffer
    and the exchange then carry ONLY the keys; the rendered payload is
    derived post-shuffle in the final projection.  Measured at sf0.1 on
    obs_blob_pack's fused sibling: 600k 4-field structs -> 3-field cut
    the aggregate+exchange from 1.85s to ~1.2s, full query 2.25 -> 1.59s,
    output byte-identical (ties beyond the key tuple render equal strings
    under either spelling, so the dropped ``_v`` tiebreak cannot change
    the joined result).
    """
    if entry_of is not None:
        s = F.struct(*[c.alias(f"_k{i}") for i, c in enumerate(order_by)])
        vals = F.transform(F.array_sort(F.collect_list(s)), entry_of)
    else:
        s = F.struct(
            *[c.alias(f"_k{i}") for i, c in enumerate(order_by)],
            entry.alias("_v"),
        )
        vals = F.transform(F.array_sort(F.collect_list(s)), lambda x: x["_v"])
    if distinct:
        # MySQL keeps the first occurrence of each distinct rendered value in
        # the ordered stream; array_distinct preserves first-seen order too.
        vals = F.array_distinct(vals)
    return vals


def packed_blob(
    entry: Column | None,
    order_by: Sequence[Column],
    distinct: bool = False,
    entry_of=None,
) -> Column:
    """Full A2 operator: ordered collect + ``' ## '`` join -> legacy blob.

    ``entry_of``: post-shuffle entry rendering from the sort-key struct —
    see :func:`ordered_collect`."""
    return F.array_join(
        ordered_collect(entry, order_by, distinct, entry_of=entry_of),
        BLOB_SEP,
    )


def obs_map_from_entries(
    key: Column, value: Column, order_by: Sequence[Column], distinct: bool = False
) -> Column:
    """Aggregate expression: MapType(key -> array<value>) with values in the
    same deterministic order the blob uses — the engine's canonical obs form
    (SURVEY §1.2: the blob becomes a derived rendering, not the storage
    format).  Pure built-in composition: sort entries, take distinct keys,
    group values per key.  ``distinct=True`` drops duplicate (key, value)
    pairs, mirroring the GROUP_CONCAT(DISTINCT ...) blob variant.
    """
    s = F.struct(
        *[c.alias(f"_k{i}") for i, c in enumerate(order_by)],
        key.alias("_key"),
        value.alias("_val"),
    )
    entries = F.filter(
        F.array_sort(F.collect_list(s)), lambda e: e["_val"].isNotNull()
    )
    if distinct:
        entries = F.array_distinct(
            F.transform(
                entries, lambda e: F.struct(e["_key"].alias("_key"), e["_val"].alias("_val"))
            )
        )
    keys = F.array_distinct(F.transform(entries, lambda e: e["_key"]))
    return F.map_from_entries(
        F.transform(
            keys,
            lambda k: F.struct(
                k.alias("key"),
                F.transform(
                    F.filter(entries, lambda e: e["_key"] == k),
                    lambda e: e["_val"],
                ).alias("value"),
            ),
        )
    )


def render_legacy_blob(obs_map: Column) -> Column:
    """Deterministic map -> ``!!k=v!! ## ...`` rendering (keys ascending,
    values in stored order).  Inverse-ish of the packing; used to emit the
    byte-compatible legacy column from the canonical MapType.
    """
    b = F.lit(BLOB_BOUNDARY)
    entries = F.transform(
        F.array_sort(F.map_keys(obs_map)),
        lambda k: F.array_join(
            F.transform(
                obs_map[k],
                lambda v: F.concat(b, k.cast("string"), F.lit("="), v, b),
            ),
            BLOB_SEP,
        ),
    )
    return F.array_join(entries, BLOB_SEP)


def blob_contains(blob: Column, concept_id: int) -> Column:
    """Legacy membership test ``obs REGEXP "!!6743="``
    (flat_visit_summary_v1.0.sql:202)."""
    return blob.contains(f"{BLOB_BOUNDARY}{concept_id}=")


def blob_extract_all(blob: Column, concept_id: int) -> Column:
    """All values of ``concept_id`` from a legacy blob as array<string> —
    replaces the reference's LOCATE/SUBSTRING_INDEX/REPLACE arithmetic
    (flat_visit_summary_v1.0.sql:202) and fixes its multi-occurrence
    concatenation quirk (SURVEY §2.11.12) by returning a proper array.
    """
    return F.regexp_extract_all(
        blob, F.lit(f"{BLOB_BOUNDARY}{concept_id}=([^!]*){BLOB_BOUNDARY}"), 1
    )


def map_first_value(obs_map: Column, concept_id: int) -> Column:
    """First stored value for a concept from the canonical map (NULL-safe)."""
    return F.element_at(obs_map, F.lit(concept_id)).getItem(0)
