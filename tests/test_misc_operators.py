"""Small-operator parity tests: P5/P7 helpers, reporter counters, CSV export,
and the property test pinning the JVM diacritics strip to the reference
Python implementation."""

import random

from pyspark.sql import functions as F

from identity_matching_spark.functions.normalize import (
    _strip_accents_udf,
    is_capitalized,
    strip_accents_col,
    strip_accents_py,
    unique_sorted,
)
from identity_matching_spark.reporter import Reporter
from identity_matching_spark.sources.io import export_csv


def test_unique_sorted(spark):
    df = spark.createDataFrame([(["b", "a", "b", "c", "a"],)], "arr array<string>")
    assert df.select(unique_sorted(F.col("arr")).alias("u")).collect()[0]["u"] == [
        "a",
        "b",
        "c",
    ]


def test_is_capitalized(spark):
    df = spark.createDataFrame([("Word",), ("word",), ("1word",)], "s string")
    got = [r[0] for r in df.select(is_capitalized(F.col("s"))).collect()]
    assert got == [True, False, False]


def test_strip_accents_jvm_matches_python_reference(spark):
    """Property test: the generated translate-map + \\p{Mn} JVM path must be
    byte-identical to the reference unicodedata implementation."""
    pools = [
        "Máximo Cuadros", "Łukasz Żółć", "noël über", "ĝis ŝi", "Ñandú",
        "Видимир", "Βίκτωρ", "ế ệ ỗ ừ", "éclair",  # decomposed é
        "ascii only", "ǅungla Ǣther", "ḷ ḹ ṝ", "ﬁ ligature", "한국어 조합",
    ]
    rng = random.Random(1)
    rand = [
        "".join(chr(rng.choice([rng.randrange(0x20, 0x250), rng.randrange(0x1E00, 0x1F00)]))
                for _ in range(12))
        for _ in range(60)
    ]
    values = pools + rand
    df = spark.createDataFrame([(v,) for v in values], "s string")
    out = df.select(
        strip_accents_col(F.col("s")).alias("jvm"), _strip_accents_udf(F.col("s")).alias("py")
    ).collect()
    for v, r in zip(values, out):
        assert r["jvm"] == r["py"] == strip_accents_py(v), repr(v)


def test_reporter_counters(spark):
    rep = Reporter(spark)
    df = spark.range(100)

    acc = rep.counter("rows seen")

    def f(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    df.mapInPandas(f, "id long").write.format("noop").mode("overwrite").save()
    rep.commit("people after reduce", 42)
    report = rep.report()
    assert report["rows seen"] == 100
    assert report["people after reduce"] == 42
    assert "rows seen" in rep.dump()


def test_export_csv(spark, tmp_path):
    df = spark.createDataFrame([(2, "b"), (1, "a")], "id long, v string")
    path = str(tmp_path / "out")
    export_csv(df, path, order_by=["id"])
    back = spark.read.option("header", True).csv(path).collect()
    assert [(r["id"], r["v"]) for r in back] == [("1", "a"), ("2", "b")]


def test_salted_count_distinct_exact(spark):
    import random

    from identity_matching_spark.operators.stats import (
        cooccurrence_popular_keys,
        salted_count_distinct,
    )

    rng = random.Random(7)
    rows = [("hot", f"v{rng.randrange(500)}") for _ in range(5000)]
    rows += [(f"k{i}", f"v{i % 9}") for i in range(300)]
    df = spark.createDataFrame(rows, "key string, value string")
    got = {r["key"]: r["n_values"] for r in salted_count_distinct(df, "key", "value").collect()}
    truth = {}
    for k, v in rows:
        truth.setdefault(k, set()).add(v)
    assert got == {k: len(vs) for k, vs in truth.items()}

    plain = {r["key"] for r in cooccurrence_popular_keys(df, "key", "value", 9).collect()}
    salted = {
        r["key"]
        for r in cooccurrence_popular_keys(df, "key", "value", 9, salted=True).collect()
    }
    assert plain == salted and "hot" in salted
