"""Execute the reference's LITERAL query IR on this engine.

The reference ships two query languages as embedded strings/dicts —
MQL filter documents handed to ``collection.find`` (streamlit_app.py:
31-32,137-148) and two Cypher templates run over Bolt (streamlit_app.py:
50, 60-64). This module accepts those exact artifacts, so parity is
demonstrable at the IR level: paste the reference's own queries, get
the same result sets from DataFrames.

Scope is the reference's observed grammar (SURVEY.md §2.2) plus one
documented step beyond it — this is a compatibility shim, not a
general MQL/Cypher engine:

- MQL: top-level equality on scalar fields, implicit AND across keys,
  ``{"$text": {"$search": s}}`` with B1 OR-of-terms semantics, and
  (the step beyond) ``$in``, ``$gt/$gte/$lt/$lte`` operator documents
  and explicit ``$and``/``$or`` clause lists. Unsupported operators
  raise rather than silently misread.
- Cypher: the full-node-scan template and the anchored 1-hop SIMILAR
  expansion with an inclusive weight range and ``$param`` binding —
  matched structurally (whitespace-insensitive), parameters bound as
  values (injection-safe: they never enter a query string) — plus one
  step beyond the observed grammar: the anchored VARIABLE-LENGTH
  expansion ``-[rs:SIMILAR*lo..hi]->`` with an ``all(x IN rs ...)``
  weight guard. Divergence pin: we return the DISTINCT endpoint set at
  MINIMUM hop count (what the similarity page consumes), not Cypher's
  per-path enumeration; cycles back to already-visited nodes are not
  re-reported.
"""

from __future__ import annotations

import re
from functools import reduce
from operator import and_, or_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from providenciasbigdata_spark.compat.documents import text_match_condition


# ---- MQL filter documents ------------------------------------------------

# comparison operators one step beyond the reference's observed grammar
# (VERDICT r2 §missing-3): the predicates the first user extending a
# filter reaches for. Anything else still raises.
_RANGE_OPS = {
    "$gt": Column.__gt__,
    "$gte": Column.__ge__,
    "$lt": Column.__lt__,
    "$lte": Column.__le__,
}


def _coerce(field: str, value):
    # the reference's dynamic year type, pinned (SURVEY.md §1.4): anio
    # compares as int whatever the client sent
    if field == "anio":
        return int(value)
    return value


def _field_condition(field: str, value) -> Column:
    if isinstance(value, dict):
        if not value:
            raise ValueError(f"empty operator document for {field!r}")
        if "$options" in value and "$regex" not in value:
            raise ValueError("$options is only valid alongside $regex")
        conds = []
        for op, operand in value.items():
            if op == "$regex":
                # Mongo $regex is an unanchored partial match — same
                # contract as Spark rlike (java.util.regex find).
                # Only the 'i' option has a faithful translation here.
                if not isinstance(operand, str):
                    raise ValueError(f"$regex needs a string, got {operand!r}")
                opts = value.get("$options", "")
                if not set(opts) <= {"i"}:
                    raise ValueError(f"unsupported $options: {opts!r}")
                pat = ("(?i)" if "i" in opts else "") + operand
                conds.append(F.col(field).cast("string").rlike(pat))
            elif op == "$options":
                continue
            elif op == "$in":
                if not isinstance(operand, (list, tuple)):
                    raise ValueError(f"$in needs a list, got {operand!r}")
                vals = [_coerce(field, v) for v in operand]
                # Mongo: $in [] matches nothing
                conds.append(F.col(field).isin(vals) if vals else F.lit(False))
            elif op in _RANGE_OPS:
                conds.append(
                    _RANGE_OPS[op](F.col(field), F.lit(_coerce(field, operand)))
                )
            else:
                raise ValueError(f"unsupported MQL operator {op} for {field!r}")
        return reduce(and_, conds)
    return F.col(field) == F.lit(_coerce(field, value))


def _query_condition(query: dict, default_language: str = "none") -> Column:
    conds: list[Column] = []
    for key, value in query.items():
        if key == "$text":
            if not (
                isinstance(value, dict)
                and {"$search"} <= set(value) <= {"$search", "$language"}
            ):
                raise ValueError(f"unsupported $text form: {value!r}")
            # $language maps onto the Snowball-lite stemmer: Spanish
            # variants stem (the reference collection's language),
            # "none" disables stemming — Mongo's own contract for the
            # option. Other languages raise (no rule tables for them).
            lang = str(value.get("$language", default_language)).lower()
            if lang in ("es", "spanish", "español", "espanol"):
                stem = True
            elif lang == "none":
                stem = False
            else:
                raise ValueError(f"unsupported $text $language: {lang!r}")
            conds.append(text_match_condition(value["$search"], stem=stem))
        elif key in ("$and", "$or"):
            if not isinstance(value, (list, tuple)) or not value:
                raise ValueError(f"{key} needs a non-empty list of clauses")
            sub = [_query_condition(q, default_language) for q in value]
            conds.append(reduce(and_ if key == "$and" else or_, sub))
        elif key.startswith("$"):
            raise ValueError(f"unsupported MQL operator: {key}")
        else:
            conds.append(_field_condition(key, value))
    return reduce(and_, conds) if conds else F.lit(True)


def mql_find(
    rulings: DataFrame, query: dict, default_language: str = "none"
) -> DataFrame:
    """``collection.find(query)`` over the rulings view.

    Supports the reference's observed filter shapes (equality on
    providencia/tipo/anio — streamlit_app.py:138,141,144 — and $text —
    :147) plus their implicit-AND composition, and one documented step
    beyond the observed grammar: ``$in``, ``$gt/$gte/$lt/$lte`` (AND-
    composed inside one operator document, as Mongo defines), and
    explicit ``$and``/``$or`` clause lists (nestable, ``$text``
    allowed inside). Empty query => full scan, like find({}).

    KNOWN DIVERGENCE for verbatim reference queries: a ``$text``
    clause WITHOUT ``$language`` defaults to UNSTEMMED matching here
    (the pinned B1 tokenize contract), but Mongo's server-side default
    follows the text INDEX's language — and the reference collection's
    Spanish index therefore stems by default, so pasting the
    reference's own ``{"$text": {"$search": ...}}`` can match fewer
    documents here. To mirror a Spanish-index collection, pass
    ``default_language="spanish"`` (the collection-level setting Mongo
    reads from the index definition); per-query ``$language`` always
    wins, ``"none"`` disables stemming either way.

    The whole filter document compiles to ONE Column predicate pushed
    into a single .filter — equality/range parts reach the parquet
    scan as pushed filters; unsupported operators raise rather than
    silently misread.
    """
    return rulings.filter(_query_condition(query, default_language))


# ---- Cypher templates ----------------------------------------------------

_NODE_SCAN_RE = re.compile(
    r"^\s*MATCH\s*\(\s*(\w+)\s*:\s*Providencia\s*\)\s*"
    r"RETURN\s+\1\.id\s+AS\s+(\w+)\s*$",
    re.IGNORECASE,
)

_NEIGHBORHOOD_RE = re.compile(
    r"^\s*MATCH\s*\(\s*(\w+)\s*:\s*Providencia\s*\{\s*id\s*:\s*\$(\w+)\s*\}\s*\)"
    r"\s*-\s*\[\s*(\w+)\s*:\s*SIMILAR\s*\]\s*->\s*\(\s*(\w+)\s*:\s*Providencia\s*\)\s*"
    r"WHERE\s+\3\.similitud\s*>=\s*\$(\w+)\s+AND\s+\3\.similitud\s*<=\s*\$(\w+)\s*"
    r"RETURN\s+\1\.id\s+AS\s+(\w+)\s*,\s*\4\.id\s+AS\s+(\w+)\s*,"
    r"\s*\3\.similitud\s+AS\s+(\w+)\s*$",
    re.IGNORECASE,
)


_VARLEN_RE = re.compile(
    r"^\s*MATCH\s*\(\s*(\w+)\s*:\s*Providencia\s*\{\s*id\s*:\s*\$(\w+)\s*\}\s*\)"
    r"\s*-\s*\[\s*(\w+)\s*:\s*SIMILAR\s*\*\s*(\d+)\s*\.\.\s*(\d+)\s*\]\s*->"
    r"\s*\(\s*(\w+)\s*:\s*Providencia\s*\)\s*"
    r"WHERE\s+ALL\s*\(\s*(\w+)\s+IN\s+\3\s+WHERE\s+"
    r"\7\.similitud\s*>=\s*\$(\w+)\s+AND\s+\7\.similitud\s*<=\s*\$(\w+)\s*\)\s*"
    r"RETURN\s+\1\.id\s+AS\s+(\w+)\s*,\s*\6\.id\s+AS\s+(\w+)\s*,"
    r"\s*length\s*\(\s*\3\s*\)\s+AS\s+(\w+)\s*$",
    re.IGNORECASE,
)


def cypher_run(
    query: str,
    nodes: DataFrame | None = None,
    edges: DataFrame | None = None,
    params: dict | None = None,
) -> DataFrame:
    """Run one of the reference's two Cypher templates against the
    nodes/edges frames (SURVEY.md §1.4 graph representation).

    Template 1 (streamlit_app.py:50): full node scan + id projection.
    Template 2 (streamlit_app.py:60-64): anchored directed 1-hop
    expansion with inclusive weight range; ``$param`` names resolve in
    ``params`` like Bolt's run(query, **params).
    Template 3 (extension): anchored variable-length expansion
    ``-[rs:SIMILAR*lo..hi]->`` with an ``all(x IN rs ...)`` weight
    guard and ``length(rs)`` projection — executed as a hop-bounded
    BFS over the weight-filtered edge set (one equi-join per level,
    frontier state only), returning each reachable endpoint once at
    its minimum hop count.
    """
    params = params or {}
    flat = " ".join(query.split())

    m = _NODE_SCAN_RE.match(flat)
    if m:
        if nodes is None:
            raise ValueError("node-scan query needs the nodes frame")
        return nodes.select(F.col("id").alias(m.group(2)))

    m = _NEIGHBORHOOD_RE.match(flat)
    if m:
        if edges is None:
            raise ValueError("expansion query needs the edges frame")
        anchor_p, lo_p, hi_p = m.group(2), m.group(5), m.group(6)
        out_origen, out_destino, out_sim = m.group(7), m.group(8), m.group(9)
        missing = [p for p in (anchor_p, lo_p, hi_p) if p not in params]
        if missing:
            raise ValueError(f"unbound Cypher parameters: {missing}")
        return (
            edges.filter(
                (F.col("src") == F.lit(params[anchor_p]))
                & F.col("similitud").between(
                    float(params[lo_p]), float(params[hi_p])
                )
            )
            .select(
                F.col("src").alias(out_origen),
                F.col("dst").alias(out_destino),
                F.col("similitud").alias(out_sim),
            )
        )

    m = _VARLEN_RE.match(flat)
    if m:
        if edges is None:
            raise ValueError("expansion query needs the edges frame")
        anchor_p, wlo_p, whi_p = m.group(2), m.group(8), m.group(9)
        hop_lo, hop_hi = int(m.group(4)), int(m.group(5))
        out_origen, out_destino, out_hops = m.group(10), m.group(11), m.group(12)
        if not 1 <= hop_lo <= hop_hi:
            raise ValueError(f"bad hop range *{hop_lo}..{hop_hi}")
        missing = [p for p in (anchor_p, wlo_p, whi_p) if p not in params]
        if missing:
            raise ValueError(f"unbound Cypher parameters: {missing}")
        from providenciasbigdata_spark.operators.graph_algos import bfs_distances

        anchor = params[anchor_p]
        fe = edges.filter(
            F.col("similitud").between(
                float(params[wlo_p]), float(params[whi_p])
            )
        )
        reached = bfs_distances(fe, anchor, max_hops=hop_hi)
        return reached.filter(F.col("hops").between(hop_lo, hop_hi)).select(
            F.lit(anchor).alias(out_origen),
            F.col("id").alias(out_destino),
            F.col("hops").cast("bigint").alias(out_hops),
        )

    raise ValueError(
        "query is outside the reference's Cypher subset "
        "(SURVEY.md §2.2 A9/A10 + the documented var-length extension); "
        "got: " + flat[:120]
    )
