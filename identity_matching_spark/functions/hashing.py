"""MinHash-LSH banding over text shingles (SURVEY §2.8 item 3; north_rule
blocking pass 2).

Hand-rolled rather than Spark ML's ``MinHashLSH`` so banding is explicit and
deterministic (the north_rule pins reproducible blocking keys). The UDF is
Arrow-batched and numpy-vectorized: per batch, each document's character
shingles are hashed once (stable 64-bit FNV-ish mix), then ``n_perm``
universal-hash permutations are applied as one (n_shingles × n_perm)
broadcasted numpy op. Band hashes come out as ``array<bigint>`` —
``explode`` + star-edges per (band_idx, band_hash) gives linear candidate
edges per bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

# 31-bit Mersenne prime: hash values and permutation params live below 2^31,
# so every product in the universal hash (a*x + b) stays below 2^62 — exact
# int64 arithmetic, no silent wraparound. (The earlier 2^61-1 field overflowed
# int64 in the vectorized multiply, quietly breaking the universal-hash
# guarantee; 31-bit minhash space keeps the Jaccard-LSH collision bound with
# 2^-31 per-pair hash collisions — negligible against LSH band probabilities.)
_MERSENNE = (1 << 31) - 1


def _perm_params(n_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_perm, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=n_perm, dtype=np.int64)
    return a, b


def make_minhash_bands_udf(
    n_perm: int = 64, n_bands: int = 16, shingle_k: int = 5, seed: int = 7
):
    """Returns a pandas UDF: text → array of n_bands band-hash longs.

    NOTE on determinism: python's str hash is salted per process — we use a
    stable FNV-1a instead (implemented below) so signatures are identical
    across executors and runs.
    """
    assert n_perm % n_bands == 0
    rows_per_band = n_perm // n_bands
    a, b = _perm_params(n_perm, seed)

    def _fnv1a(s: str) -> int:
        h = 0xCBF29CE484222325
        for ch in s.encode("utf-8"):
            h ^= ch
            h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    def _shingles(text: str) -> np.ndarray:
        t = text.lower()
        if len(t) < shingle_k:
            t = t.ljust(shingle_k, "_")
        seen = {_fnv1a(t[i : i + shingle_k]) for i in range(len(t) - shingle_k + 1)}
        return np.fromiter(seen, dtype=np.uint64, count=len(seen))

    @F.pandas_udf(ArrayType(LongType()))
    def minhash_bands(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            if text is None or text == "":
                out.append(None)
                continue
            sh = (_shingles(text) % _MERSENNE).astype(np.int64)
            # (n_shingles, n_perm) universal hashes → column-wise min; all
            # operands < 2^31 so products < 2^62: exact in int64
            sig = ((sh[:, None] * a + b) % _MERSENNE).min(axis=0)
            bands = sig.reshape(n_bands, rows_per_band)
            # one stable hash per band (mod per term keeps sums < 2^33·r)
            band_hash = (bands * a[:rows_per_band] % _MERSENNE).sum(axis=1) % _MERSENNE
            out.append([int(i) << 48 | int(h) & 0xFFFFFFFFFFFF for i, h in enumerate(band_hash)])
        return pd.Series(out)

    return minhash_bands


def lsh_candidate_edges(
    df: DataFrame,
    text_col: str,
    id_col: str = "id",
    n_perm: int = 64,
    n_bands: int = 16,
    shingle_k: int = 5,
    seed: int = 7,
    max_bucket: int = 64,
) -> DataFrame:
    """Candidate edges from MinHash-LSH buckets: star edges per bucket.

    ``max_bucket`` drops degenerate buckets (boilerplate documents) — the
    drop is logged upstream via metrics, never silent truncation without a
    count. Returns DataFrame[src, dst].
    """
    udf = make_minhash_bands_udf(n_perm, n_bands, shingle_k, seed)
    bands = df.select(F.col(id_col).alias("id"), F.explode(udf(F.col(text_col))).alias("bucket"))
    # partial-aggregated bucket stats + join back: skew-safe for degenerate
    # buckets (same shape as operators/blocking.star_edges)
    stats = bands.groupBy("bucket").agg(
        F.min("id").alias("src"), F.count(F.lit(1)).alias("bucket_n")
    )
    out = (
        bands.join(stats, "bucket")
        .where((F.col("src") != F.col("id")) & (F.col("bucket_n") <= max_bucket))
        .select("src", F.col("id").alias("dst"))
        .distinct()
    )
    return out
