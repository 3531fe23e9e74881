"""pagerank_spark — a PySpark-native link-graph analytics engine.

A from-scratch DataFrame/Catalyst implementation of the capabilities of
the reference C++ distributed PageRank engine (laewonJeong/pagerank),
extended to a full link-graph analytics suite (PageRank, connected
components via large-star/small-star, label propagation, triangle
counting), an Arrow-vectorized extraction stage that mines a
``(repo, path, commit, lang, content)`` source-code table into an edge
table, explicit skew handling (hub salting), per-iteration
checkpointing with lineage + metrics, and the large-scale
training-data pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing).

Layout:
    session.py           SparkSession factory (AQE, Arrow, shuffle tuning)
    io.py                table IO layer (Parquet; Iceberg when available)
    datagen.py           deterministic synthetic corpora / graphs
    graph.py             edge-table normalization, degrees, dense-id encoding
    extraction.py        Arrow/pandas-UDF import mining -> edge table
    skew.py              hub-salted gather join
    checkpoint.py        iteration-stamped checkpoints + metrics + resume
    operators/           pagerank, components, labelprop, triangles
    pipeline/            dedup, similarity, textstats, multimodal
"""

__version__ = "0.1.0"
