"""Signature CSV cache roundtrip (S2/S3) — semantics of
/root/reference/people.go:444-579 and people_test.go:181-211: normalization
happens at read time; rows with empty fields or bad timestamps are dropped."""

import datetime as dt

from pyspark.sql import functions as F

from identity_matching_spark.sources.io import (
    read_signature_cache,
    write_signature_cache,
)


def test_cache_roundtrip_normalizes_and_drops(spark, tmp_path):
    rows = [
        ("repo1", "Máximo  Cuadros", "MC@Gmail.com", "aaa", dt.datetime(2019, 1, 1)),
        ("repo2", "bob", "bob@google.com", "bbb", dt.datetime(2019, 2, 1)),
        ("", "noname", "x@y.com", "ccc", dt.datetime(2019, 3, 1)),  # empty repo → dropped
        ("repo3", "", "x@y.com", "ddd", dt.datetime(2019, 3, 1)),  # empty name → dropped
    ]
    df = spark.createDataFrame(
        rows, "repo string, name string, email string, hash string, ts timestamp"
    )
    path = str(tmp_path / "cache")
    write_signature_cache(df, path)
    back = read_signature_cache(spark, path)
    got = {(r["repo"], r["name"], r["email"], r["hash"]) for r in back.collect()}
    assert got == {
        ("repo1", "maximo cuadros", "mc@gmail.com", "aaa"),
        ("repo2", "bob", "bob@google.com", "bbb"),
    }
    ts = {r["repo"]: r["ts"] for r in back.collect()}
    assert ts["repo1"] == dt.datetime(2019, 1, 1)


def test_cache_drops_unparseable_time(spark, tmp_path):
    p = tmp_path / "cache2"
    p.mkdir()
    (p / "part.csv").write_text(
        "repo,name,email,hash,time\n"
        "r1,alice,a@b.com,h1,2019-01-01T00:00:00Z\n"
        "r2,bob,b@b.com,h2,not-a-time\n"
    )
    back = read_signature_cache(spark, str(p))
    names = [r["name"] for r in back.collect()]
    assert names == ["alice"]
