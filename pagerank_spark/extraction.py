"""Edge derivation from the repo-files table via Arrow-vectorized UDFs.

The mandated extraction stage (BASELINE.json north star): mine
``(repo, path, commit, lang, content)`` for import/include references,
resolve module names to owning repos, and emit a deduplicated
``(src_repo, dst_repo)`` edge table — with ``sha2(content, 256)``
preserved per row through the stage (the per-row invariant).

Physical shape for 1e12 files:

- ``content`` is touched EXACTLY ONCE, inside one ``pandas_udf`` that
  regex-extracts module tokens per Arrow batch (``Series.str.findall``
  — vectorized C, no per-row Python).  Everything downstream operates
  on the tiny ``(repo, module)`` projection; Catalyst prunes
  ``content`` out of every later scan (verify with
  ``.explain``: ReadSchema excludes content).
- The module→repo ownership map is |modules|-sized (≪ corpus) and
  broadcast for the resolution join.
- The final dedupe is a groupBy on (src_repo, dst_repo) — partial
  aggregation collapses duplicates map-side before the shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

# Per-language reference syntax (FIXTURES.md F1).  Each pattern's first
# capture group is the module token.
_LANG_PATTERNS: dict[str, list[str]] = {
    "python": [
        r"^\s*import\s+([A-Za-z_][\w\.]*)",
        r"^\s*from\s+([A-Za-z_][\w\.]*)\s+import\b",
    ],
    "c": [
        r'^\s*#\s*include\s*"([^"]+)\.h"',
        r"^\s*#\s*include\s*<([^>]+)\.h>",
    ],
    "javascript": [
        r"""require\(\s*['"]([^'"]+)['"]\s*\)""",
        r"""^\s*import\s+.*?\bfrom\s+['"]([^'"]+)['"]""",
    ],
}


@pandas_udf(T.ArrayType(T.StringType()))
def _extract_modules(lang: pd.Series, content: pd.Series) -> pd.Series:
    """Module tokens referenced by each file — one Arrow batch at a
    time, vectorized regex per language group (no per-row Python)."""
    out = pd.Series([[]] * len(content), index=content.index, dtype=object)
    for lg, patterns in _LANG_PATTERNS.items():
        mask = lang == lg
        if not mask.any():
            continue
        chunk = content[mask]
        acc: pd.Series | None = None
        for pat in patterns:
            found = chunk.str.findall(pat, flags=__import__("re").MULTILINE)
            acc = found if acc is None else acc + found
        out[mask] = acc
    return out


def file_hashes(files: DataFrame) -> DataFrame:
    """(repo, path, commit, content_sha) — the per-row invariant
    column; JVM-side sha2, no Python."""
    return files.select(
        "repo", "path", "commit", F.sha2("content", 256).alias("content_sha")
    )


def module_ownership(files: DataFrame) -> DataFrame:
    """(module, owner_repo): module name = file stem of ``path``.

    Derived purely from paths (no content read).  A module claimed by
    multiple repos resolves to the lexicographically smallest repo for
    determinism.
    """
    stem = F.regexp_extract(
        F.element_at(F.split("path", "/"), -1), r"^(.*?)(?:\.[^.]*)?$", 1)
    return (
        files.select(stem.alias("module"), F.col("repo").alias("owner_repo"))
        .groupBy("module")
        .agg(F.min("owner_repo").alias("owner_repo"))
    )


def extract_references(files: DataFrame) -> DataFrame:
    """(repo, path, commit, content_sha, module) — one row per
    referenced module token per file.  The only stage that reads
    ``content``."""
    return (
        files.select(
            "repo", "path", "commit",
            F.sha2("content", 256).alias("content_sha"),
            F.explode_outer(
                _extract_modules(F.col("lang"), F.col("content"))
            ).alias("module"),
        )
        .where(F.col("module").isNotNull())
    )


def derive_edges(files: DataFrame,
                 broadcast_owners: bool = True) -> DataFrame:
    """(src_repo, dst_repo) — unique, self-edges dropped.

    src = the importing file's repo, dst = the repo owning the
    referenced module (unresolvable references are dropped).

    ``broadcast_owners`` picks the resolution-join strategy.  The
    ownership map is |distinct modules|-sized — far smaller than the
    corpus, so broadcast is right for most runs — but at the mandated
    1e12-file scale distinct module stems can reach 1e8+ rows (multiple
    GB of strings), past practical broadcast limits: pass False there
    and the resolution becomes a shuffled hash/sort-merge join on
    ``module``, with AQE's skew handling covering hot module names
    (results are identical either way; equivalence-tested).
    """
    refs = extract_references(files)
    owners = module_ownership(files)
    owners_side = F.broadcast(owners) if broadcast_owners else owners
    return (
        refs.join(owners_side, "module")
        .select(F.col("repo").alias("src_repo"),
                F.col("owner_repo").alias("dst_repo"))
        .where(F.col("src_repo") != F.col("dst_repo"))
        .dropDuplicates(["src_repo", "dst_repo"])
    )


def edge_table_with_ids(files: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Full extraction pipeline: (edges(src,dst), dictionary(name,id),
    edges_str(src_repo,dst_repo))."""
    from pagerank_spark.graph import encode_dense_ids

    edges_str = derive_edges(files)
    edges, dictionary = encode_dense_ids(edges_str)
    return edges, dictionary, edges_str
