from pagerank_spark.operators.pagerank import pagerank, PageRankResult
from pagerank_spark.operators.components import connected_components
from pagerank_spark.operators.labelprop import label_propagation
from pagerank_spark.operators.triangles import triangle_count, triangles_per_vertex

__all__ = [
    "pagerank",
    "PageRankResult",
    "connected_components",
    "label_propagation",
    "triangle_count",
    "triangles_per_vertex",
]
