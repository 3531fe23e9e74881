from pagerank_spark.operators.pagerank import pagerank, PageRankResult
from pagerank_spark.operators.ppr import personalized_pagerank
from pagerank_spark.operators.components import connected_components
from pagerank_spark.operators.labelprop import (conductance, label_propagation,
                                                 modularity, modularity_score)
from pagerank_spark.operators.triangles import triangle_count, triangles_per_vertex
from pagerank_spark.operators.bfs import bfs_depths
from pagerank_spark.operators.betweenness import betweenness
from pagerank_spark.operators.hits import hits
from pagerank_spark.operators.katz import katz_centrality, KatzResult
from pagerank_spark.operators.msf import minimum_spanning_forest
from pagerank_spark.operators.sampling import neighbor_sample
from pagerank_spark.operators.scc import strongly_connected_components
from pagerank_spark.operators.sssp import shortest_paths
from pagerank_spark.operators.structure import (
    clustering_coefficients,
    core_decomposition,
    degree_assortativity,
    degree_distribution,
    k_core,
)

__all__ = [
    "pagerank",
    "PageRankResult",
    "personalized_pagerank",
    "connected_components",
    "conductance",
    "label_propagation",
    "modularity",
    "modularity_score",
    "triangle_count",
    "triangles_per_vertex",
    "bfs_depths",
    "betweenness",
    "hits",
    "katz_centrality",
    "KatzResult",
    "shortest_paths",
    "strongly_connected_components",
    "clustering_coefficients",
    "core_decomposition",
    "k_core",
    "minimum_spanning_forest",
    "neighbor_sample",
    "degree_distribution",
    "degree_assortativity",
]
