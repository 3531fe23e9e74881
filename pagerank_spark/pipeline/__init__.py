"""Large-scale training-data pipeline operators over the documents /
embeddings tables: deduplication (exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding cosine), similarity search (brute-force and
LSH-bucketed ANN), text analysis (language id, quality, tokens,
fingerprints), and multimodal column plumbing."""

from pagerank_spark.pipeline import dedup, similarity, textstats, multimodal  # noqa: F401
