"""The reference app's two pages, end to end on this engine.

Runs the exact interaction flow of SebastianUs28/providenciasBigData's
streamlit_app.py against the parquet fixtures — facet query, text
search, similarity-graph neighborhood — printing what each page would
render. Usage:

    python examples/reference_app_flow.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from providenciasbigdata_spark.engine import ProvidenciasEngine
from providenciasbigdata_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="reference-flow", master="local[4]", shuffle_partitions=4)
    eng = ProvidenciasEngine(spark, sf_dir)

    # -- page 1: "Resultados de los Filtros" ------------------------------
    tipos = eng.facet_options("tipo")
    print(f"[page 1] tipo options ({len(tipos)}): {tipos[:5]} ...")
    frame = eng.query_rulings_frame(tipo=tipos[0])
    print(f"[page 1] facet tipo={tipos[0]!r}: {len(frame)} rulings")

    frame = eng.query_rulings_frame(texto="merge window")
    print(f"[page 1] text search 'merge window': {len(frame)} rulings")

    # full Mongo $search grammar through the same box (round 5): a
    # quoted phrase is a contiguous token run; -term subtracts
    frame = eng.query_rulings_frame(texto='"table hash" -error')
    print(f"[page 1] phrase+negation '\"table hash\" -error': {len(frame)} rulings")

    frame = eng.query_rulings_frame(providencia="P-does-not-exist")
    print(f"[page 1] empty-result sentinel columns: {list(frame.columns)}")

    # -- page 1, literal IR: the pymongo calls the reference makes --------
    from providenciasbigdata_spark.compat.ir import mql_find

    rulings = eng.rulings()
    found = mql_find(rulings, {"tipo": tipos[0]})
    print(f"[page 1/IR] collection.find({{'tipo': ...}}): {found.count()} rulings")
    # cursor surface: projection + sort + limit, as a client would page
    page = mql_find(
        rulings,
        {"tipo": tipos[0]},
        projection={"providencia": 1, "anio": 1},
        sort=[("anio", -1), ("providencia", 1)],
        limit=10,
    )
    print(f"[page 1/IR] first page (proj+sort+limit): {page.count()} rows")

    # -- page 2: "Filtrar por Similitudes" --------------------------------
    ids = eng.node_ids()
    anchor = ids[7]
    nodes, edges = eng.neighborhood_graph(anchor, lo=20.0, hi=100.0)
    print(
        f"[page 2] anchor {anchor}: {edges.count()} SIMILAR edges in [20,100], "
        f"{nodes.count()} nodes to render"
    )
    edges.show(5, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
