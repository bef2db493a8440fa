"""Reference-compatibility API: the two query families of the reference
app (facet/text document queries; similarity-graph neighborhood), with
the reference's quirks preserved and documented (SURVEY.md §2.2/§2.3).
"""

from providenciasbigdata_spark.compat.documents import (  # noqa: F401
    EMPTY_SENTINEL_COLUMN,
    distinct_values,
    filter_equals,
    query_cascade,
    rulings_view,
    search_text,
    to_result_frame,
)
from providenciasbigdata_spark.compat.graph import (  # noqa: F401
    build_similarity_edges,
    list_nodes,
    neighborhood,
    neighborhood_nodes,
    nodes_view,
)
