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
    """Exact top-k cosine neighbors for each query vector.

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


def _probe_cells(bits: int, n_probe: int) -> list[list[int]]:
    """For each cell: the n_probe nearest cells by Hamming distance
    (deterministic order: distance, then cell index)."""
    cells = []
    for c in range(1 << bits):
        ring = sorted(range(1 << bits), key=lambda x: (bin(c ^ x).count("1"), x))
        cells.append(ring[:n_probe])
    return cells


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
    are scored. Recall rises with n_probe (n_probe = 2^bits → exact)."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bits, seed)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("emb")
    ).withColumn("cell", cell_of(F.col("emb"), planes))
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qemb")
    ).withColumn("qcell", cell_of(F.col("qemb"), planes))

    probes = _probe_cells(bits, n_probe)
    probe_map = F.array(*[F.array(*[F.lit(x) for x in ring]) for ring in probes])
    q = q.withColumn("cell", F.explode(F.element_at(probe_map, F.col("qcell") + 1)))

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
