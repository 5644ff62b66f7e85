"""Property test: the Spark engine's clusters match an independent pure-
Python simulator of the reference's semantics on randomized inputs.

The simulator below re-implements, from the documented semantics (SURVEY.md
§2.5/§2.6; /root/reference/matching.go:102-236 behavior, not its code):
email blocking with popular-email skip, name blocking keyed by external id,
the anonymous-group merge, and union-find transitive closure. Cap semantics
are excluded (the reference's cap is order-dependent; ours is pinned by the
golden tests instead).
"""

import random

import pytest
from pyspark.sql import functions as F

from identity_matching_spark.operators.blacklist import Blacklist
from identity_matching_spark.operators.cluster import reduce_people


def simulate_reference(persons, popular_emails, popular_names, email_ext=None):
    """persons: list of (id, name_key, email). Returns {id: cluster_min_id}."""
    email_ext = email_ext or {}
    parent = {pid: pid for pid, _, _ in persons}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    ext_of = {pid: email_ext.get(email, "") for pid, _, email in persons}

    # external-id edges
    by_ext = {}
    for pid, _, email in persons:
        e = ext_of[pid]
        if e:
            by_ext.setdefault(e, []).append(pid)
    for group in by_ext.values():
        for x in group[1:]:
            union(group[0], x)

    # email edges (popular + matched skipped)
    by_email = {}
    for pid, _, email in persons:
        if email in popular_emails:
            continue
        if email_ext and email in email_ext and email_ext[email]:
            continue
        by_email.setdefault(email, []).append(pid)
    for group in by_email.values():
        for x in group[1:]:
            union(group[0], x)

    # component-level external id, FROZEN after the email phase (the engine
    # computes all name edges against phase-1 components in parallel)
    comp_ext = {}
    for pid in parent:
        r = find(pid)
        if ext_of[pid]:
            comp_ext[r] = ext_of[pid]

    # name pass over phase-1 components: per-(name, ext) star edges + J3
    # candidates; then CC; conflicted components drop their J3 edges
    by_name: dict[str, set[int]] = {}
    for pid, name_key, _ in persons:
        if name_key in popular_names:
            continue
        by_name.setdefault(name_key, set()).add(find(pid))
    plain_edges, j3_edges = [], []
    for name_key, comps in by_name.items():
        subgroups: dict[str, list[int]] = {}
        for c in sorted(comps):
            subgroups.setdefault(comp_ext.get(c, ""), []).append(c)
        for sub in subgroups.values():
            for x in sub[1:]:
                plain_edges.append((sub[0], x))
        if len(subgroups) == 2 and "" in subgroups:
            allm = sorted(comps)
            for x in allm[1:]:
                j3_edges.append((allm[0], x))

    def cc(edges, nodes):
        p = {n: n for n in nodes}

        def f(x):
            while p[x] != x:
                p[x] = p[p[x]]
                x = p[x]
            return x

        for a, b in edges:
            ra, rb = f(a), f(b)
            if ra != rb:
                p[max(ra, rb)] = min(ra, rb)
        return {n: f(n) for n in nodes}

    comp_nodes = {find(pid) for pid in parent}
    final = cc(plain_edges + j3_edges, comp_nodes)
    # conflict cleanup: final comps holding >1 distinct ext drop J3 edges
    exts_in = {}
    for c in comp_nodes:
        if c in comp_ext:
            exts_in.setdefault(final[c], set()).add(comp_ext[c])
    bad_finals = {f for f, es in exts_in.items() if len(es) > 1}
    if bad_finals:
        bad_nodes = {c for c in comp_nodes if final[c] in bad_finals}
        kept_j3 = [(a, b) for a, b in j3_edges if a not in bad_nodes and b not in bad_nodes]
        final = cc(plain_edges + kept_j3, comp_nodes)

    return {pid: final[find(pid)] for pid in parent}


def _random_persons(rng, n):
    names = [f"name{rng.randrange(max(2, n // 3))}" for _ in range(n)]
    emails = [f"e{rng.randrange(max(2, n // 2))}@x.com" for _ in range(n)]
    return [(i + 1, names[i], emails[i]) for i in range(n)]


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_parity_no_external_ids(spark, seed):
    rng = random.Random(seed)
    persons = _random_persons(rng, 60)
    popular_names = {"name0"}
    popular_emails = {"e0@x.com"}
    bl = Blacklist(
        domains=frozenset(), top_level_domains=frozenset(), names=frozenset(),
        emails=frozenset(), popular_emails=frozenset(popular_emails),
        popular_names=frozenset(popular_names),
    )
    df = spark.createDataFrame(
        [(i, n, n, e) for i, n, e in persons],
        "id long, name string, name_key string, email string",
    )
    got = {
        r["id"]: r["component"]
        for r in reduce_people(df, bl, max_identities=None).collect()
    }
    want = simulate_reference(persons, popular_emails, popular_names)
    assert got == want


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_parity_with_external_ids(spark, seed):
    rng = random.Random(seed)
    persons = _random_persons(rng, 40)
    # a consistent per-email external mapping (distinct emails → stable user)
    emails = sorted({e for _, _, e in persons})
    email_ext = {}
    for e in emails:
        roll = rng.random()
        if roll < 0.4:
            email_ext[e] = f"user_{e.split('@')[0]}"
    bl = Blacklist(
        domains=frozenset(), top_level_domains=frozenset(), names=frozenset(),
        emails=frozenset(), popular_emails=frozenset(), popular_names=frozenset(),
    )
    df = spark.createDataFrame(
        [(i, n, n, e) for i, n, e in persons],
        "id long, name string, name_key string, email string",
    )
    ext_df = spark.createDataFrame(
        [(e, u) for e, u in email_ext.items()], "email string, external_id string"
    )
    got = {
        r["id"]: r["component"]
        for r in reduce_people(df, bl, max_identities=None, external_ids=ext_df).collect()
    }
    want = simulate_reference(persons, set(), set(), email_ext=email_ext)
    assert got == want
