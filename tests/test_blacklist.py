"""Blacklist predicate tests, ported from /root/reference/blacklist_test.go:51-132."""

from pyspark.sql import functions as F

from identity_matching_spark.operators.blacklist import Blacklist


def _eval(spark, pred_builder, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    rows = df.select(pred_builder(F.col("s")).alias("out")).collect()
    return [bool(r["out"]) for r in rows]


def test_default_blacklist_contents():
    b = Blacklist.default()
    assert "users.noreply.github.com" in b.domains
    assert "localdomain" in b.top_level_domains
    assert "your name" in b.names
    assert "badges@fossa.io" in b.emails
    assert "a@a.a" in b.popular_emails
    assert "alex" in b.popular_names
    assert "bob" in b.popular_names and "alice" in b.popular_names


def test_is_multiple_email(spark):
    b = Blacklist.testing()
    assert _eval(
        spark,
        b.is_multiple_email,
        ["first@mail.com second@mail.com", "first@mail.com;second@mail.com", "first@mail.com"],
    ) == [True, True, False]


def test_is_blacklisted_email(spark):
    b = Blacklist.testing()
    assert _eval(spark, b.is_blacklisted_email, ["nobody@android.com", "somebody@android.com"]) == [
        True,
        False,
    ]


def test_is_ignored_domain(spark):
    b = Blacklist.testing()
    trues = [
        "1@localhost.localdomain",
        "admin@example.com",
        "max@example.com",
        "localhost.localdomain",
        "example.com",
    ]
    falses = ["somebody@android.com", "android.com"]
    assert _eval(spark, b.is_ignored_domain, trues) == [True] * len(trues)
    assert _eval(spark, b.is_ignored_domain, falses) == [False] * len(falses)


def test_is_ignored_tld(spark):
    b = Blacklist.testing()
    falses = ["not_ignored", "full.domain.not_ignored", "email@full.domain.not_ignored"]
    trues = ["ignored_tld", "full.domain.ignored_tld", "email@full.domain.ignored_tld"]
    assert _eval(spark, b.is_ignored_tld, falses) == [False] * len(falses)
    assert _eval(spark, b.is_ignored_tld, trues) == [True] * len(trues)


def test_is_ip_domain(spark):
    b = Blacklist.testing()
    trues = [
        "0.0.0.0",
        "192.168.0.1",
        "88.35.10.128",
        "2001:db8:85a3::8a2e:370:7334",
        "2001:db8:85a3:0:0:8a2e:370:7334",
        "0:0:0:0:0:0:0:1",
        "blockchaindev34.172.20.180.160",
    ]
    falses = ["notip.com", "notip", "88.131.110"]
    assert _eval(spark, b.is_ip_domain, trues) == [True] * len(trues)
    assert _eval(spark, b.is_ip_domain, falses) == [False] * len(falses)


def test_is_single_label_domain(spark):
    b = Blacklist.testing()
    assert _eval(spark, b.is_single_label_domain, ["singlelabel", "", "not.singlelabel", "."]) == [
        True,
        True,
        False,
        False,
    ]


def test_is_ignored_name(spark):
    b = Blacklist.testing()
    assert _eval(spark, b.is_ignored_name, ["unknown", "known"]) == [True, False]


def test_is_ignored_email(spark):
    b = Blacklist.testing()
    trues = [
        "bad@email",
        "root@0.0.0.0",
        "admin@2001:db8:85a3::8a2e:370:7334",
        "no-domain-mail@",
        "admin1@google.com admin2@google.com",
        "bad-domain@example.com",
        "nobody@android.com",
        "not a mail",
    ]
    falses = [
        "good-email@google.com",
        "dot.in.name@is.ok.com",
        "dash-in-name@is.ok.com",
        "max@google.com",
        "admin-vadim@google.com",
        "also+ok-mail@inbox.org",
    ]
    assert _eval(spark, b.is_ignored_email, trues) == [True] * len(trues)
    assert _eval(spark, b.is_ignored_email, falses) == [False] * len(falses)
