"""Round-4 hardening tests (VERDICT r3 #5/#7 + ADVICE r3 items):

* match-cache file contract — explicit ``seq`` on dump, seq-based last-wins
  across part files, loud rejection of seq-less multi-file caches, and a
  crash-safe rename-aside rewrite (reference contract: external/cache.go
  DumpOnDisk :153-259 never destroys entries);
* MinHash bands on texts shorter than the shingle width (ADVICE r3 low —
  pinned: padding guarantees ≥1 shingle, no crash, usable bands).
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from identity_matching_spark.sources.io import (
    read_match_cache,
    write_match_cache,
)


def _write_csv(path, rows, header="email,user,match"):
    with open(path, "w") as fh:
        fh.write(header + "\n")
        for r in rows:
            fh.write(",".join(str(c) for c in r) + "\n")


def test_seqless_multifile_cache_rejected(spark, tmp_path):
    """A foreign cache split across files has no recoverable row order —
    Spark packs splits by size, not file order — so the read refuses it
    instead of resolving duplicates by listing order (ADVICE r3 medium)."""
    d = tmp_path / "cache.csv"
    d.mkdir()
    _write_csv(str(d / "part-0.csv"), [("a@x", "u1", "1")])
    _write_csv(str(d / "part-1.csv"), [("a@x", "u2", "0")])
    with pytest.raises(ValueError, match="no .*seq"):
        read_match_cache(spark, str(d))


def test_seq_cache_last_wins_across_parts(spark, tmp_path):
    """With the explicit seq column, last-wins is exact no matter how the
    rows are spread across part files or how Spark splits them."""
    d = tmp_path / "cache.csv"
    d.mkdir()
    _write_csv(
        str(d / "part-0.csv"),
        [("a@x", "u-old", "0", 1), ("b@x", "ub", "1", 4)],
        header="email,user,match,seq",
    )
    _write_csv(
        str(d / "part-1.csv"),
        [("a@x", "u-new", "1", 7)],
        header="email,user,match,seq",
    )
    got = {r["email"]: (r["user"], r["matched"]) for r in read_match_cache(spark, str(d)).collect()}
    assert got == {"a@x": ("u-new", True), "b@x": ("ub", True)}


def test_written_cache_carries_seq_and_rereads(spark, tmp_path):
    p = str(tmp_path / "cache.csv")
    updates = spark.createDataFrame(
        [("a@x", "ua", True), ("b@x", "ub", False)],
        "email string, user string, matched boolean",
    )
    write_match_cache(spark, p, updates)
    files = [f for f in os.listdir(p) if not f.startswith((".", "_"))]
    assert files, "cache dir has data files"
    with open(os.path.join(p, sorted(files)[0])) as fh:
        assert fh.readline().strip() == "email,user,match,seq"
    # merge a correction on top: seq-based last-wins must pick the update
    write_match_cache(
        spark,
        p,
        spark.createDataFrame([("a@x", "ua2", True)], "email string, user string, matched boolean"),
    )
    got = {r["email"]: (r["user"], r["matched"]) for r in read_match_cache(spark, p).collect()}
    assert got == {"a@x": ("ua2", True), "b@x": ("ub", False)}


def test_crash_between_rename_aside_and_swap_recovers(spark, tmp_path):
    """Simulated crash in the swap window: the previous cache sits at
    ``__old`` and nothing at ``path`` — the next read restores it."""
    p = str(tmp_path / "cache.csv")
    write_match_cache(
        spark,
        p,
        spark.createDataFrame([("a@x", "ua", True)], "email string, user string, matched boolean"),
    )
    os.rename(p, p + "__old")  # crash happened right after the rename-aside
    got = {r["email"]: r["user"] for r in read_match_cache(spark, p).collect()}
    assert got == {"a@x": "ua"}
    assert os.path.exists(p) and not os.path.exists(p + "__old")


def test_write_clears_stale_old_aside(spark, tmp_path):
    """A leftover ``__old`` from a crash mid-delete must not block or
    corrupt the next rewrite."""
    p = str(tmp_path / "cache.csv")
    df = spark.createDataFrame([("a@x", "ua", True)], "email string, user string, matched boolean")
    write_match_cache(spark, p, df)
    shutil.copytree(p, p + "__old")  # stale aside
    write_match_cache(
        spark,
        p,
        spark.createDataFrame([("b@x", "ub", True)], "email string, user string, matched boolean"),
    )
    got = {r["email"] for r in read_match_cache(spark, p).collect()}
    assert got == {"a@x", "b@x"}
    assert not os.path.exists(p + "__old")


def test_minhash_bands_on_short_text(spark):
    """Texts shorter than shingle_k are padded to one shingle — the bands
    UDF must return usable band hashes, not crash (ADVICE r3 low, pinned)."""
    from identity_matching_spark.functions.hashing import make_minhash_bands_udf

    udf = make_minhash_bands_udf(n_perm=16, n_bands=8, shingle_k=2)
    df = spark.createDataFrame(
        [("a",), ("",), (None,), ("ab",)], "t string"
    ).select(udf(F.col("t")).alias("bands"))
    rows = df.collect()
    assert len(rows[0]["bands"]) == 8          # 1-char text: padded shingle
    assert rows[1]["bands"] is None            # empty: guarded
    assert rows[2]["bands"] is None            # null: guarded
    assert len(rows[3]["bands"]) == 8
