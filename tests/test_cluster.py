"""Clustering golden tests, ported from /root/reference/matching_test.go.

The reference's order-dependent max-identities semantics are replaced by the
deterministic per-block greedy documented in operators/cluster.py; these
fixtures pin that both paths produce the reference's expected clusters.
"""

import random

import pytest
from pyspark.sql import functions as F

from identity_matching_spark.operators.blacklist import Blacklist
from identity_matching_spark.operators.cc import connected_components
from identity_matching_spark.operators.cluster import reduce_people, set_primary_values


def _persons(spark, rows):
    # rows: (id, name, email) — name_key == name (fixtures are pre-qualified)
    return spark.createDataFrame(
        [(i, n, n, e) for i, n, e in rows], "id long, name string, name_key string, email string"
    )


def _clusters(result):
    out = {}
    for r in result.collect():
        out.setdefault(r["component"], set()).add(r["id"])
    return {frozenset(v) for v in out.values()}, {
        r["component"]: r["external_id"] for r in result.collect()
    }


def test_reduce_people(spark):
    """matching_test.go:17-47 — 7 persons → 3 clusters."""
    rows = [
        (1, "Bob 1", "Bob@google.com"),
        (2, "Bob 2", "Bob@google.com"),
        (3, "Alice", "alice@google.com"),
        (4, "Bob", "Bob@google.com"),
        (5, "popular", "Bob@google.com"),
        (6, "popular", "email@google.com"),
        (7, "Alice", "popular@google.com"),
    ]
    result = reduce_people(_persons(spark, rows), Blacklist.testing(), max_identities=100)
    clusters, _ = _clusters(result)
    assert clusters == {frozenset({1, 2, 4, 5}), frozenset({3, 7}), frozenset({6})}
    comps = {r["id"]: r["component"] for r in result.collect()}
    assert comps[1] == 1 and comps[3] == 3 and comps[6] == 6


def test_reduce_people_no_cap_fast_path(spark):
    rows = [
        (1, "Bob 1", "Bob@google.com"),
        (2, "Bob 2", "Bob@google.com"),
        (3, "Alice", "alice@google.com"),
        (4, "Bob", "Bob@google.com"),
        (5, "popular", "Bob@google.com"),
        (6, "popular", "email@google.com"),
        (7, "Alice", "popular@google.com"),
    ]
    result = reduce_people(_persons(spark, rows), Blacklist.testing(), max_identities=None)
    clusters, _ = _clusters(result)
    assert clusters == {frozenset({1, 2, 4, 5}), frozenset({3, 7}), frozenset({6})}


def test_reduce_people_max_identities(spark):
    """matching_test.go:49-84 — cap=4 splits the Bob mega-cluster."""
    rows = [
        (1, "Bob", "Bob2@google.com"),
        (2, "Bob 1", "Bob@google.com"),
        (3, "Bob 2", "Bob@google.com"),
        (4, "Bob 3", "Bob@google.com"),
        (5, "Bob", "Bob@google.com"),
        (6, "Bob", "Bob3@google.com"),
        (7, "Bob", "Bob4@google.com"),
        (8, "Alice 1", "alice@google.com"),
        (9, "Alice 2", "alice@google.com"),
        (10, "Alice 2", "alice1@google.com"),
    ]
    result = reduce_people(_persons(spark, rows), Blacklist.testing(), max_identities=4)
    clusters, _ = _clusters(result)
    assert clusters == {
        frozenset({1, 6, 7}),
        frozenset({2, 3, 4, 5}),
        frozenset({8, 9, 10}),
    }


def test_reduce_people_same_name_different_external_ids(spark):
    """matching_test.go:287-315 — same name + different external ids never merge."""
    rows = [
        (1, "Bob", "Bob@google.com"),
        (2, "Bob", "Bob2@google.com"),
        (3, "Alice", "alice@google.com"),
        (4, "Bob 2", "Bob@google.com"),
    ]
    ext = spark.createDataFrame(
        [
            ("Bob@google.com", "bob_username"),
            ("Bob2@google.com", "not_bob_username"),
            ("alice@google.com", "alice_username"),
        ],
        "email string, external_id string",
    )
    result = reduce_people(
        _persons(spark, rows), Blacklist.testing(), max_identities=100, external_ids=ext
    )
    clusters, ext_by_comp = _clusters(result)
    assert clusters == {frozenset({1, 4}), frozenset({2}), frozenset({3})}
    assert ext_by_comp[1] == "bob_username"
    assert ext_by_comp[2] == "not_bob_username"
    assert ext_by_comp[3] == "alice_username"


def test_anonymous_group_merges_into_single_external_id(spark):
    """J3 (matching.go:184-207): a name block with exactly one external id
    plus anonymous members merges them."""
    rows = [
        (1, "Bob", "a@x.com"),
        (2, "Bob", "b@x.com"),
        (3, "Bob", "c@x.com"),
    ]
    ext = spark.createDataFrame([("a@x.com", "bob_gh")], "email string, external_id string")
    result = reduce_people(
        _persons(spark, rows), Blacklist.testing(), max_identities=100, external_ids=ext
    )
    clusters, ext_by_comp = _clusters(result)
    assert clusters == {frozenset({1, 2, 3})}
    assert ext_by_comp[1] == "bob_gh"


# --- primary values (matching_test.go:317-407) ---------------------------


def _members(spark, people):
    rows = []
    for pid, names, emails in people:
        rows += [(pid, n, None) for n in names]
        rows += [(pid, None, e) for e in emails]
    return spark.createDataFrame(rows, "component long, name string, email string")


def _freqs(spark, d):
    return spark.createDataFrame(
        [(k, r, t) for k, (r, t) in d.items()], "value string, recent long, total long"
    )


EMAIL_FREQS = {
    "Bob@google.com": (5, 8),
    "bobby@google.com": (2, 4),
    "12345@gmail.com": (1, 1),
    "email@google.com": (2, 4),
    "alice@google.com": (1, 5),
    "al@google.com": (3, 3),
    "admin@google.com": (6, 6),
}
NAME_FREQS = {
    "Bob": (5, 10),
    "Bob 1": (1, 3),
    "Bob 2": (1, 1),
    "popular": (4, 20),
    "Alice": (3, 4),
    "Alice 1": (1, 5),
    "admin": (3, 5),
}
PEOPLE = [
    (1, ["Bob", "Bob 1", "Bob 2", "popular"], ["Bob@google.com", "bobby@google.com", "12345@gmail.com"]),
    (3, ["Alice", "Alice 1"], ["alice@google.com", "al@google.com"]),
    (6, ["popular"], ["email@google.com"]),
]


def test_set_primary_value_emails_min2(spark):
    out = set_primary_values(
        _members(spark, PEOPLE), _freqs(spark, NAME_FREQS), _freqs(spark, EMAIL_FREQS), 2
    )
    emails = {r["id"]: r["primary_email"] for r in out.collect()}
    assert emails == {1: "Bob@google.com", 3: "al@google.com", 6: "email@google.com"}


def test_set_primary_values_min5(spark):
    out = set_primary_values(
        _members(spark, PEOPLE), _freqs(spark, NAME_FREQS), _freqs(spark, EMAIL_FREQS), 5
    )
    got = {r["id"]: (r["primary_name"], r["primary_email"]) for r in out.collect()}
    assert got == {
        1: ("Bob", "Bob@google.com"),
        3: ("Alice 1", "alice@google.com"),
        6: ("popular", "email@google.com"),
    }


# --- connected components vs a local union-find oracle -------------------


class _UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


@pytest.mark.parametrize("seed,n,m", [(1, 50, 40), (2, 200, 150), (3, 100, 300)])
def test_connected_components_random(spark, seed, n, m):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    uf = _UF()
    for a, b in edges:
        uf.union(a, b)
    for i in range(n):
        uf.find(i)
    expected = {i: min(j for j in range(n) if uf.find(j) == uf.find(i)) for i in range(n)}

    edf = spark.createDataFrame(edges, "src long, dst long")
    ndf = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(edf, nodes=ndf).collect()
    }
    assert got == expected


def test_connected_components_chain(spark):
    """Worst-case diameter: a path graph must still converge."""
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(edf).select("component").distinct().collect()
    assert [r["component"] for r in got] == [0]


def test_reduce_people_empty_input(spark):
    persons = spark.createDataFrame([], "id long, name string, name_key string, email string")
    out = reduce_people(persons, Blacklist.testing(), max_identities=20)
    assert out.count() == 0


def test_reduce_people_all_popular(spark):
    """All names popular and all emails popular → nothing ever merges."""
    rows = [(1, "popular", "popular@email.com"), (2, "popular", "popular@email.com")]
    persons = spark.createDataFrame(
        [(i, n, n, e) for i, n, e in rows], "id long, name string, name_key string, email string"
    )
    out = reduce_people(persons, Blacklist.testing(), max_identities=20)
    comps = {r["id"]: r["component"] for r in out.collect()}
    assert comps == {1: 1, 2: 2}


def test_reduce_people_single_person(spark):
    persons = spark.createDataFrame(
        [(7, "solo", "solo", "solo@x.com")], "id long, name string, name_key string, email string"
    )
    out = reduce_people(persons, Blacklist.testing(), max_identities=None)
    assert [(r["id"], r["component"]) for r in out.collect()] == [(7, 7)]
