"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in identity_matching_spark.plans.driver_queries; each
query there carries its oracle SQL next to the Spark code. A few inherently
non-SQL operators (pandas-UDF MinHash-LSH blocking, the order-dependent
max-identities cap, the transcript pipeline over a synthesized corpus) are
registered without oracles → the driver records rows-only checks for them.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full identity resolution over signatures derived from the
    sf0.001 customer table (blocking → CC → clusters → aliases)."""
    from identity_matching_spark.operators.blacklist import Blacklist
    from identity_matching_spark.operators.cluster import build_aliases, reduce_people

    sf_dir = "/root/testdata/sf0.001"
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    base = (F.col("c_custkey") / 10).cast("long")
    persons = c.select(
        F.col("c_custkey").cast("long").alias("id"),
        F.lit("chan0").alias("repo"),
        F.concat(F.lit("n"), base.cast("string"), F.lit("-"), (F.col("c_custkey") % 2).cast("string")).alias("name"),
        F.concat(F.lit("e"), base.cast("string"), F.lit("-"), (F.col("c_custkey") % 3).cast("string"), F.lit("@corp.io")).alias("email"),
        F.lit(False).alias("popular_name"),
    ).withColumn("name_key", F.col("name"))
    membership = reduce_people(persons, Blacklist.default(), max_identities=20)
    members = persons.join(membership, "id")
    return build_aliases(members).orderBy("id", "email", "name")


def _rows_only_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Operators with no faithful ANSI-SQL twin → weaker rows-only checks."""

    def transcripts_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
        # deterministic synthetic corpus (sf-independent; the oracle DB has
        # no transcripts view): full extraction→blocking→CC→aliases run
        from identity_matching_spark.plans.pipeline import PipelineConfig, run_pipeline
        from identity_matching_spark.sources.synth import synth_transcripts

        t = synth_transcripts(spark, n_convs=1000, n_persons=100, seed=42)
        out = run_pipeline(
            spark, t, PipelineConfig(reference_time=dt.datetime(2026, 1, 1))
        )
        return out["aliases"].orderBy("id", "email", "name", "repo")

    def lsh_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
        # production Arrow-vectorized MinHash-LSH banding over documents
        from identity_matching_spark.functions.hashing import lsh_candidate_edges

        d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            F.col("doc_id").alias("id"), "text"
        )
        return lsh_candidate_edges(d, "text", n_perm=32, n_bands=8).orderBy("src", "dst")

    def max_identities_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
        # deterministic cap semantics on the reference's mega-cluster fixture
        from identity_matching_spark.operators.blacklist import Blacklist
        from identity_matching_spark.operators.cluster import reduce_people

        rows = [
            (1, "Bob", "Bob2@google.com"), (2, "Bob 1", "Bob@google.com"),
            (3, "Bob 2", "Bob@google.com"), (4, "Bob 3", "Bob@google.com"),
            (5, "Bob", "Bob@google.com"), (6, "Bob", "Bob3@google.com"),
            (7, "Bob", "Bob4@google.com"), (8, "Alice 1", "alice@google.com"),
            (9, "Alice 2", "alice@google.com"), (10, "Alice 2", "alice1@google.com"),
        ]
        persons = spark.createDataFrame(
            [(i, n, n, e) for i, n, e in rows],
            "id long, name string, name_key string, email string",
        )
        out = reduce_people(persons, Blacklist.testing(), max_identities=4)
        return out.select("id", "component").orderBy("id")

    def similarity_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
        # similarity-mode e2e (north-rule pipeline: MinHash-LSH candidates +
        # batched Jaro-Winkler verify feeding the clusterer) over a seeded
        # typo corpus — the sim-mode twin of q20, pinned by a VALUES golden
        from identity_matching_spark.plans.pipeline import PipelineConfig, run_pipeline
        from identity_matching_spark.sources.synth import synth_transcripts

        t = synth_transcripts(spark, n_convs=800, n_persons=80, seed=33, typo_rate=0.2)
        out = run_pipeline(
            spark,
            t,
            PipelineConfig(reference_time=dt.datetime(2026, 1, 1), similarity_mode=True),
        )
        return out["aliases"].orderBy("id", "email", "name", "repo")

    return {
        "q20_transcripts_pipeline": transcripts_pipeline,
        "q21_lsh_blocking": lsh_blocking,
        "q22_max_identities_cap": max_identities_cap,
        "q33_similarity_pipeline": similarity_pipeline,
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from identity_matching_spark.plans.driver_queries import QUERIES

    out = dict(QUERIES)
    out.update(_rows_only_queries())
    return out


def oracle_sql() -> dict[str, str]:
    import os

    from identity_matching_spark.plans.driver_queries import ORACLES

    out = dict(ORACLES)
    try:
        # literal VALUES goldens for the seeded-deterministic non-SQL ops
        # (generated by tools/gen_golden_oracles.py)
        from identity_matching_spark.plans.golden_oracles import (
            GOLDEN_ORACLES,
            GOLDEN_SF_DIR,
            SF_COUPLED,
        )

        golden = dict(GOLDEN_ORACLES)
        # q21/q25 read the documents table, so their goldens are only valid
        # at the scale factor they were generated from. If the driver runs
        # correctness at a different SF (signaled via SPARK_GRAFT_SF_DIR;
        # the documented gate is sf0.01), omit them — rows-only beats a red
        # row that means "fixture scale", not "engine defect".
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", GOLDEN_SF_DIR)
        if os.path.basename(sf_dir.rstrip("/")) != os.path.basename(
            GOLDEN_SF_DIR.rstrip("/")
        ):
            for name in SF_COUPLED:
                golden.pop(name, None)
        out.update(golden)
    except ImportError:
        pass
    return out
