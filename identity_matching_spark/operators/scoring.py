"""Pairwise candidate scoring (SURVEY §7 step 6; north_rule stage 3).

Exact mode needs no scorer — reference edges ARE matches (same block key =
score 1.0; J1–J3 semantics live in operators/cluster.py). Similarity mode
scores LSH/blocking candidates with batched Jaro-Winkler (pandas UDF) and
normalized Levenshtein (JVM built-in), keeping pairs above threshold.

The candidate join broadcasts nothing blindly: both sides are keyed by person
id, so AQE picks the strategy; candidate volume is linear in block sizes by
construction (star edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from identity_matching_spark.functions.similarity import jaro_winkler_udf, levenshtein_ratio


def score_pairs(
    persons: DataFrame,
    candidates: DataFrame,
    name_col: str = "name",
    jw_threshold: float = 0.90,
    lev_threshold: float | None = None,
) -> DataFrame:
    """Attach similarity scores to candidate edges and filter.

    persons: DataFrame[id, <name_col>, ...]; candidates: DataFrame[src, dst].
    Returns DataFrame[src, dst, jw, lev] for pairs passing the threshold(s).
    """
    left = persons.select(F.col("id").alias("src"), F.col(name_col).alias("_name_src"))
    right = persons.select(F.col("id").alias("dst"), F.col(name_col).alias("_name_dst"))
    scored = (
        candidates.join(left, "src")
        .join(right, "dst")
        .withColumn("jw", jaro_winkler_udf(F.col("_name_src"), F.col("_name_dst")))
        .withColumn("lev", levenshtein_ratio(F.col("_name_src"), F.col("_name_dst")))
    )
    cond = F.col("jw") >= jw_threshold
    if lev_threshold is not None:
        cond = cond | (F.col("lev") >= lev_threshold)
    return scored.where(cond).select("src", "dst", "jw", "lev")
