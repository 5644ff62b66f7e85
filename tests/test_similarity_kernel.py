"""Property tests for the vectorized Jaro-Winkler kernel: the numpy batch
implementation must agree with the scalar reference spec on every input, and
with DuckDB's independent C++ implementation on ASCII input (the pinned
oracle semantics: integer half-transpositions, 0.7 boost threshold)."""

import random

import duckdb
import pandas as pd
import pytest

from identity_matching_spark.functions.similarity import (
    jaro_winkler,
    jaro_winkler_batch,
)

CURATED = [
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("jellyfish", "smellyfish"),
    ("dwayne", "duane"),
    ("abc", "abc"),
    ("", "abc"),
    ("", ""),
    ("a", "b"),
    ("ab", "ba"),
    ("abXXXX", "abYYYY"),  # prefix + jaro below the 0.7 boost threshold
    ("aaaaaaab", "baaaaaaa"),
]


def test_vectorized_matches_scalar_curated():
    a = pd.Series([p[0] for p in CURATED])
    b = pd.Series([p[1] for p in CURATED])
    got = jaro_winkler_batch(a, b).tolist()
    want = [jaro_winkler(x, y) for x, y in CURATED]
    assert got == pytest.approx(want, abs=1e-12)


def test_vectorized_matches_scalar_random_unicode():
    rng = random.Random(11)
    alph = "abcdef 123éüß"
    pairs = [
        (
            "".join(rng.choice(alph) for _ in range(rng.randint(0, 24))),
            "".join(rng.choice(alph) for _ in range(rng.randint(0, 24))),
        )
        for _ in range(4000)
    ]
    pairs += [(None, "x"), ("x", None), (None, None)]
    got = jaro_winkler_batch(
        pd.Series([p[0] for p in pairs]), pd.Series([p[1] for p in pairs])
    ).tolist()
    want = [
        0.0 if x is None or y is None else jaro_winkler(x, y) for x, y in pairs
    ]
    assert got == pytest.approx(want, abs=1e-12)


def test_matches_duckdb_on_ascii():
    """DuckDB's jaro_winkler_similarity is the independent oracle (it works
    on utf-8 bytes, so the equivalence claim is ASCII-only)."""
    rng = random.Random(7)
    alph = "abcdef 123"
    con = duckdb.connect()
    for _ in range(1500):
        x = "".join(rng.choice(alph) for _ in range(rng.randint(1, 16)))
        y = "".join(rng.choice(alph) for _ in range(rng.randint(1, 16)))
        d = con.execute("SELECT jaro_winkler_similarity(?, ?)", [x, y]).fetchone()[0]
        assert jaro_winkler(x, y) == pytest.approx(d, abs=1e-9), (x, y)


def test_empty_and_identity_semantics():
    assert jaro_winkler("", "") == 0.0  # pinned: DuckDB/classic C behavior
    assert jaro_winkler("", "x") == 0.0
    assert jaro_winkler("same", "same") == 1.0
