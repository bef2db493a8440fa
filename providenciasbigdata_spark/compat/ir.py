"""Execute the reference's LITERAL query IR on this engine.

The reference ships two query languages as embedded strings/dicts —
MQL filter documents handed to ``collection.find`` (streamlit_app.py:
31-32,137-148) and two Cypher templates run over Bolt (streamlit_app.py:
50, 60-64). This module accepts those exact artifacts, so parity is
demonstrable at the IR level: paste the reference's own queries, get
the same result sets from DataFrames.

Scope is pinned to the reference's observed grammar (SURVEY.md §2.2) —
this is a compatibility shim, not a general MQL/Cypher engine:

- MQL: top-level equality on scalar fields, implicit AND across keys,
  and ``{"$text": {"$search": s}}`` with B1 OR-of-terms semantics.
  Unsupported operators raise rather than silently misread.
- Cypher: the full-node-scan template and the anchored 1-hop SIMILAR
  expansion with an inclusive weight range and ``$param`` binding —
  matched structurally (whitespace-insensitive), parameters bound as
  values (injection-safe: they never enter a query string).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from providenciasbigdata_spark.compat.documents import filter_equals, search_text


# ---- MQL filter documents ------------------------------------------------

def mql_find(rulings: DataFrame, query: dict) -> DataFrame:
    """``collection.find(query)`` over the rulings view.

    Supports the reference's observed filter shapes (equality on
    providencia/tipo/anio — streamlit_app.py:138,141,144 — and $text —
    :147), plus their implicit-AND composition, which Mongo defines for
    multi-key documents. Empty query => full scan, like find({}).
    """
    out = rulings
    for key, value in query.items():
        if key == "$text":
            if not (isinstance(value, dict) and set(value) == {"$search"}):
                raise ValueError(f"unsupported $text form: {value!r}")
            out = search_text(out, value["$search"])
        elif key.startswith("$"):
            raise ValueError(f"unsupported MQL operator: {key}")
        elif isinstance(value, dict):
            raise ValueError(f"unsupported nested predicate for {key!r}: {value!r}")
        else:
            out = filter_equals(out, key, value)
    return out


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

    raise ValueError(
        "query is outside the reference's Cypher subset "
        "(SURVEY.md §2.2 A9/A10); got: " + flat[:120]
    )
