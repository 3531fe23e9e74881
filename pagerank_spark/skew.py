"""Hub salting for skewed gather joins (mandated skew handling).

On power-law graphs a hub vertex's rank row joins against millions of
edge rows; hash partitioning on ``src`` then lands all of them in one
task.  Salting splits each hot key into ``num_salts`` sub-keys:

- edge side: ``salt = hash(dst) % S`` for hot srcs (computed ONCE and
  persisted with the graph — it is static),
- rank side: hot rank rows are replicated S times via
  ``explode(sequence(...))`` (cheap: |hot| * S rows),
- join on ``(src, salt)`` — numerically identical to the unsalted
  join, equivalence-tested in ``tests/test_skew.py``.

AQE's skew-join splitting remains enabled as a backstop
(``session.py``), but salting is deterministic and also fixes the
*aggregation-input* imbalance that AQE's join splitting alone cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hot_vertices(out_deg: DataFrame, threshold: int) -> DataFrame:
    """(src, is_hot=true) for vertices with out-degree above threshold."""
    return (
        out_deg.where(F.col("out_deg") > threshold)
        .select(F.col("id").alias("src"), F.lit(True).alias("is_hot"))
    )


def salt_edges(edges: DataFrame, hot: DataFrame, num_salts: int) -> DataFrame:
    """Edge table with a deterministic ``salt`` column.

    Non-hot srcs keep salt 0, so the salted join degenerates to the
    plain join for the non-skewed bulk of the graph.
    """
    return (
        edges.join(F.broadcast(hot), "src", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("is_hot"),
                F.pmod(F.xxhash64("dst"), F.lit(num_salts)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("is_hot")
    )


def salt_rank_side(ranks_w: DataFrame, hot: DataFrame, num_salts: int) -> DataFrame:
    """Replicate hot rank rows across all salts; cold rows get salt 0.

    ``ranks_w`` must have a ``src`` key column; all other columns pass
    through unchanged.
    """
    return (
        ranks_w.join(F.broadcast(hot), "src", "left")
        .withColumn(
            "salt",
            F.explode(
                F.when(
                    F.col("is_hot"), F.sequence(F.lit(0), F.lit(num_salts - 1))
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .withColumn("salt", F.col("salt").cast("int"))
        .drop("is_hot")
    )


def salted_gather(salted_edges: DataFrame, ranks_w: DataFrame,
                  hot: DataFrame, num_salts: int,
                  value=None) -> DataFrame:
    """Gather Σ value per dst over a pre-salted edge table.

    ``ranks_w``: (src, w, ...).  Returns (dst, contrib).  ``value``
    defaults to the rank side's ``w`` column; a weighted gather passes
    an expression over joined columns (e.g. ``w * f`` where ``f`` is
    the edge table's precomputed split fraction) — the salted join is
    numerically identical either way because salting only re-keys
    rows, never changes which (edge, rank) pairs meet.
    """
    r = salt_rank_side(ranks_w, hot, num_salts)
    value = F.col("w") if value is None else value
    return (
        salted_edges.join(r, ["src", "salt"])
        .groupBy("dst")
        .agg(F.sum(value).alias("contrib"))
    )
