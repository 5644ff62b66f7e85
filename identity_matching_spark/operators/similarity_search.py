"""Approximate nearest-neighbor search over embedding columns.

Two paths over ``DataFrame[id, embedding: array<float>]``:

* ``brute_force_topk`` — exact baseline: broadcast the (small) query set,
  JVM-side cosine (zip_with/aggregate — no Python), window top-k. One pass
  over the corpus; at 100 TB this is the scan-everything fallback.
* ``ivf_topk`` — scale path: a deterministic random-hyperplane coarse
  quantizer assigns every vector to a cell (like IVF/LSH bucketing); queries
  probe their own cell plus ``n_probe`` neighboring cells (lowest Hamming
  distance), so the scan touches ~n_probe/2^bits of the corpus. Partition
  the corpus by cell and the probe join becomes partition-pruned.

The quantizer's hyperplanes are seeded numpy vectors broadcast as literals —
deterministic across runs and cluster sizes.
"""

from __future__ import annotations



import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from identity_matching_spark.functions.similarity import cosine_similarity


def _as_double(col):
    return col.cast("array<double>")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector — the BASELINE/
    ORACLE shape (broadcast corpus×queries). Production searches take
    :func:`ivf_topk` / :func:`ivf_neardup_pairs`; nothing in the package
    calls this from a pipeline (tests and q14's oracle twin only).

    Returns DataFrame[query_id, neighbor_id, sim, rank]; ties broken by
    neighbor id ascending (deterministic).
    """
    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("emb"))
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qemb"))
    sim = cosine_similarity(F.col("qemb"), F.col("emb"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    sims = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return sims.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _hyperplanes(dim: int, bits: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim)


def cell_of(vec_col, planes: np.ndarray):
    """Random-hyperplane cell id: bit b = sign(<v, h_b>). Pure expressions —
    the planes are literal arrays, dot products via zip_with/aggregate."""
    cell = F.lit(0)
    for b in range(planes.shape[0]):
        h = F.array(*[F.lit(float(x)) for x in planes[b]])
        dot = F.aggregate(
            F.zip_with(vec_col, h, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        cell = cell + F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return cell


def _probe_masks(bits: int, n_probe: int) -> list[int]:
    """XOR masks of the ``n_probe`` nearest cells in the Hamming ball around
    any cell, ordered by (Hamming distance, mask value) — deterministic and
    query-independent. O(n_probe) driver work + a single distance-class sort,
    never a 2^bits × 2^bits table: bits=16+ plans build instantly.
    """
    import itertools

    n_probe = min(n_probe, 1 << bits)
    masks: list[int] = []
    for dist in range(bits + 1):
        cls = sorted(
            sum(1 << b for b in combo) for combo in itertools.combinations(range(bits), dist)
        )
        masks.extend(cls[: n_probe - len(masks)])
        if len(masks) >= n_probe:
            break
    return masks


def _expand_probes(df: DataFrame, cell_col: str, masks: list[int]) -> DataFrame:
    """One row per probed cell: cell XOR each Hamming-ball mask."""
    probe = F.explode(F.array(*[F.lit(m) for m in masks])).alias("_mask")
    return df.select("*", probe).withColumn(
        cell_col, F.col(cell_col).bitwiseXOR(F.col("_mask"))
    ).drop("_mask")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "id",
    vec_col: str = "embedding",
    bits: int = 4,
    n_probe: int = 5,
    dim: int | None = None,
    seed: int = 13,
    round_digits: int | None = 4,
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's probed cells
    are scored. Recall rises with n_probe (n_probe = 2^bits → exact).

    ``dim`` (the embedding width) is required: inferring it would need a
    ``.first()`` — a driver-side Spark action during plan construction,
    which serializes pipelines that build many plans before running them.
    """
    if dim is None:
        raise ValueError(
            "pass dim explicitly (embedding width); inferring it would run a "
            "driver action during plan construction"
        )
    planes = _hyperplanes(dim, bits, seed)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("emb")
    ).withColumn("cell", cell_of(F.col("emb"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qemb")
    ).withColumn("qcell", cell_of(F.col("qemb"), planes))

    q = _expand_probes(q.withColumnRenamed("qcell", "cell"), "cell", _probe_masks(bits, n_probe))

    sim = cosine_similarity(F.col("qemb"), F.col("emb"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    sims = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return sims.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ivf_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "id",
    vec_col: str = "embedding",
    bits: int = 4,
    n_probe: int = 2,
    dim: int | None = None,
    seed: int = 13,
    round_digits: int | None = 4,
) -> DataFrame:
    """Corpus-vs-corpus embedding near-duplicate pairs — the 100 TB scale
    path that replaces the all-pairs non-equi join.

    Every vector sits in its quantizer cell; one join side is additionally
    expanded into its ``n_probe``-cell Hamming ball. A pair (a, b) becomes a
    candidate iff ``cell(a) XOR cell(b)`` is one of the probe masks (the XOR
    makes the test symmetric, so expanding one side suffices). Candidates are
    verified with exact cosine; ``n_probe = 2^bits`` probes every mask, which
    makes the operator provably exact — the property the q30 oracle pins.

    Scale shape: an equi-join on ``cell`` (hash shuffle, AQE skew-split for
    hot cells) touching ~n_probe/2^bits of the corpus per vector — never an
    all-pairs cross join. Returns DataFrame[id_a, id_b, sim] with id_a < id_b.

    ``dim`` is required for the same reason as in ``ivf_topk``: no driver
    action during plan construction.
    """
    if dim is None:
        raise ValueError(
            "pass dim explicitly (embedding width); inferring it would run a "
            "driver action during plan construction"
        )
    planes = _hyperplanes(dim, bits, seed)

    base = corpus.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("emb")
    ).withColumn("cell", cell_of(F.col("emb"), planes))
    probed = _expand_probes(
        base.select(F.col("id").alias("id_a"), F.col("emb").alias("ea"), "cell"),
        "cell",
        _probe_masks(bits, n_probe),
    )
    home = base.select(F.col("id").alias("id_b"), F.col("emb").alias("eb"), "cell")

    sim = cosine_similarity(F.col("ea"), F.col("eb"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    # no dedup needed: each pair (a, b) joins through exactly one mask —
    # m = cell(a) XOR cell(b) — and the mask list is duplicate-free, so a
    # dropDuplicates here would only add a second full shuffle of the
    # candidate set (carrying both embedding arrays) for nothing
    return (
        probed.join(home, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("sim"))
        .where(F.col("sim") >= threshold)
    )
