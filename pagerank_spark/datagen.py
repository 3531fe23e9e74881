"""Deterministic synthetic data generators (no external data).

Two families:

1. ``repo_files_corpus`` — the mandated input shape
   ``(repo, path, commit, lang, content)`` (BASELINE.json input_hint),
   with seeded import statements referencing other repos' modules and
   a ground-truth edge set emitted alongside (FIXTURES.md F1).
2. Graph generators for fixtures and benchmarks: power-law (Zipf
   out-degree) graphs with an optional mega-hub for skew testing
   (FIXTURES.md F4), built distributed via ``spark.range`` +
   column expressions so benchmark inputs of any size never pass
   through the driver.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import DataFrame, SparkSession, functions as F

REPO_FILES_SCHEMA = (
    "repo STRING, path STRING, commit STRING, lang STRING, content STRING"
)

_NOISE = [
    "x = compute(1, 2)",
    "# local helper, no external deps",
    "def helper(): return 42",
    "int main_local(void) { return 0; }",
    "const t = window.setTimeout(() => {}, 10);",
    "value = value + offset  # accumulate",
    "/* boundary conditions checked upstream */",
    "print('stage complete')",
]


def _commit_sha(seed_str: str) -> str:
    return hashlib.sha1(seed_str.encode()).hexdigest()


def _import_stmt(lang: str, module: str, rng: random.Random) -> str:
    if lang == "python":
        return rng.choice([f"import {module}", f"from {module} import thing"])
    if lang == "c":
        return rng.choice([f'#include "{module}.h"', f"#include <{module}.h>"])
    # javascript
    return rng.choice(
        [f"const m = require('{module}');", f"import {{ x }} from '{module}';"]
    )


_EXT = {"python": "py", "c": "c", "javascript": "js"}


def repo_files_corpus(
    spark: SparkSession,
    n_repos: int = 5,
    files_per_repo: int = 4,
    seed: int = 42,
    cross_refs_per_file: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Build the F1 mini corpus.

    Each repo ``org/repo<i>`` owns modules named ``r<i>_m<j>`` (one per
    file, path ``src/r<i>_m<j>.<ext>``).  Every file's content holds
    ``cross_refs_per_file`` seeded import statements referencing OTHER
    repos' modules (ground truth), occasional self-imports (must be
    dropped as self-edges), deliberate duplicate imports (must dedupe),
    and noise lines.

    Returns (files_df, truth_edges_df) where truth_edges has columns
    (src_repo, dst_repo) — unique, no self-edges.
    """
    rng = random.Random(seed)
    langs = ["python", "c", "javascript"]
    repos = [f"org/repo{i}" for i in range(n_repos)]
    module_owner = {}
    for i in range(n_repos):
        for j in range(files_per_repo):
            module_owner[f"r{i}_m{j}"] = repos[i]
    modules = sorted(module_owner)

    rows = []
    truth = set()
    for i, repo in enumerate(repos):
        for j in range(files_per_repo):
            lang = langs[(i + j) % len(langs)]
            module = f"r{i}_m{j}"
            lines = [f"// {repo} :: {module}" if lang != "python"
                     else f"# {repo} :: {module}"]
            targets = []
            for _ in range(cross_refs_per_file):
                tgt = rng.choice(modules)
                targets.append(tgt)
                if rng.random() < 0.3:  # deliberate duplicate import
                    targets.append(tgt)
            for tgt in targets:
                lines.append(_import_stmt(lang, tgt, rng))
                owner = module_owner[tgt]
                if owner != repo:
                    truth.add((repo, owner))
                lines.append(rng.choice(_NOISE))
            content = "\n".join(lines)
            rows.append((repo, f"src/{module}.{_EXT[lang]}",
                         _commit_sha(f"{seed}:{repo}:{module}"), lang, content))

    files_df = spark.createDataFrame(rows, REPO_FILES_SCHEMA)
    truth_df = spark.createDataFrame(
        sorted(truth), "src_repo STRING, dst_repo STRING")
    return files_df, truth_df


def repo_files_from_docs(docs: DataFrame, n_repos: int = 40) -> DataFrame:
    """Oracle-portable repo-files synthesis: derive the mandated
    ``(repo, path, commit, lang, content)`` table (BASELINE.json
    input_hint) deterministically from a ``documents(doc_id, text)``
    table using only expressions with exact DuckDB equivalents, so
    driver queries over this corpus are value-hash-checked end to end
    (unlike ``repo_files_corpus``, whose driver-side ``random`` stream
    has no SQL twin).

    Document ``d`` becomes one python file owning module ``m<d>`` in
    repo ``org/repo<d % n_repos>``; its content imports modules
    ``m<(7d+1) % N>`` and ``m<(13d+5) % N>`` (two co-prime strides →
    a connected, skewless reference graph) followed by the document
    text as a comment line — so ``content_sha`` depends on the full
    text, and the extraction regexes see exactly two module tokens.
    """
    n = docs.select(F.count(F.lit(1)).alias("_n_docs"))
    did = F.col("doc_id").cast("bigint")
    a = ((did * 7 + 1) % F.col("_n_docs")).cast("string")
    b = ((did * 13 + 5) % F.col("_n_docs")).cast("string")
    content = F.concat(
        F.lit("import m"), a, F.lit("\n"),
        F.lit("from m"), b, F.lit(" import thing\n# "),
        F.replace(F.col("text"), F.lit("\n"), F.lit(" ")))
    return docs.crossJoin(F.broadcast(n)).select(
        F.concat(F.lit("org/repo"),
                 (did % n_repos).cast("string")).alias("repo"),
        F.concat(F.lit("src/m"), did.cast("string"),
                 F.lit(".py")).alias("path"),
        F.md5(F.concat(F.lit("c:"), did.cast("string"))).alias("commit"),
        F.lit("python").alias("lang"),
        content.alias("content"),
    )


def documents_corpus(
    spark: SparkSession,
    n_docs: int,
    tokens_per_doc: int = 60,
    vocab: int = 50_000,
    dup_stride: int = 100,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Seeded ``documents(doc_id, text)`` corpus built DISTRIBUTED
    (column expressions over ``spark.range`` — any size without the
    driver in the data path), shaped to stress the dedup family's
    scale guards:

    - every doc opens with the same three tokens, so ONE ubiquitous
      shingle appears in all N docs — an uncapped shingle self-join
      would go O(N²); the ``max_df`` cap must bind;
    - every ``dup_stride``-th doc is byte-identical boilerplate — one
      degenerate exact-dup group AND one degenerate MinHash/LSH bucket
      of N/dup_stride members; the ``max_bucket`` cap must bind;
    - remaining tokens are per-doc xxhash64 draws from ``vocab``, so
      non-degenerate shingles stay near-unique (realistic long tail).
    """
    ids = spark.range(0, n_docs, numPartitions=partitions)
    toks = [
        F.concat(
            F.lit("w"),
            (F.abs(F.xxhash64("id", F.lit(seed), F.lit(i)))
             % F.lit(vocab)).cast("string"))
        for i in range(tokens_per_doc)
    ]
    body = F.concat_ws(" ", F.lit("the quick brown"), *toks)
    boiler = F.lit(
        "the quick brown " + " ".join(f"b{i}" for i in range(tokens_per_doc)))
    return ids.select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % dup_stride == 0, boiler)
        .otherwise(body).alias("text"),
    )


def power_law_graph(
    spark: SparkSession,
    n_vertices: int,
    n_edges: int,
    seed: int = 42,
    zipf_exponent: float = 1.5,
    hub_fraction: float = 0.0,
    partitions: int | None = None,
) -> DataFrame:
    """Seeded power-law directed graph built DISTRIBUTED (no driver
    materialization): edge k gets endpoints from two independent
    xxhash64 streams mapped through an inverse-Zipf transform, so both
    in- and out-degree are Zipf-distributed with hot low ids.

    ``hub_fraction`` > 0 additionally rewires that fraction of edges to
    originate at vertex 0 — the FIXTURES.md F4 "one hub of degree n/2"
    skew shape for salting benchmarks.

    Deterministic in (n_vertices, n_edges, seed): the same edge list on
    any cluster size and partition count.
    """
    ids = spark.range(0, n_edges, numPartitions=partitions)
    # u ~ Uniform(0,1) from a hash; v = floor(N * u^alpha) gives a
    # Zipf-like mass on small ids for alpha = 1/(exponent-1) > 1.
    alpha = 1.0 / (zipf_exponent - 1.0)

    def zipf_vertex(stream: int):
        h = F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(stream)))
        u = (h % F.lit(1_000_003)).cast("double") / F.lit(1_000_003.0)
        return F.least(
            F.floor(F.lit(float(n_vertices)) * F.pow(u, F.lit(alpha)))
            .cast("bigint"),
            F.lit(n_vertices - 1),
        )

    df = ids.select(
        zipf_vertex(1).alias("src"), zipf_vertex(2).alias("dst"))
    if hub_fraction > 0.0:
        hub_sel = (
            (F.abs(F.xxhash64(F.col("src"), F.col("dst"), F.lit(seed + 7)))
             % F.lit(1000)).cast("double") / F.lit(1000.0)
        ) < F.lit(hub_fraction)
        df = df.select(
            F.when(hub_sel, F.lit(0)).otherwise(F.col("src")).alias("src"),
            F.col("dst"),
        )
    return df.where(F.col("src") != F.col("dst"))
