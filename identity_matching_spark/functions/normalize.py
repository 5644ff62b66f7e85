"""Normalization expressions (SURVEY §2.2 P1–P9).

Semantics match the reference exactly:

* ``cleanName``/``cleanEmail`` (/root/reference/people.go:605-627): strip
  diacritics → lowercase → collapse whitespace → trim.
* ``removeDiacritical`` (/root/reference/strings.go:41-47): NFD → drop Unicode
  Mn marks → NFC; identical to ``strip_accents``
  (/root/reference/research/idmatching/__init__.py:4-7).
* ``normalizeSpaces`` (/root/reference/people.go:635-637): split on any
  unicode whitespace, join with single spaces.
* ``removeParens`` (/root/reference/people.go:629-633).
* repo-qualified name rendering ``{name, repo}``
  (/root/reference/people.go:100-105).

Everything stays JVM-side except the diacritics strip, which has no Spark
built-in. That one is an Arrow-vectorized pandas UDF, and it is only invoked
on rows that actually contain non-ASCII characters — ASCII rows (the vast
majority at corpus scale) short-circuit through ``F.when`` and never leave
whole-stage codegen.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# Java regex with the UNICODE_CHARACTER_CLASS flag so \s covers U+3000 and
# friends, mirroring Go strings.Fields / Python str.split().
_UNICODE_WS = r"(?U)\s+"
_NON_ASCII = r"[^\x00-\x7F]"


def strip_accents_py(s: str) -> str:
    """Reference-identical accent strip: NFD → drop Mn marks → NFC."""
    s = "".join(c for c in unicodedata.normalize("NFD", s) if unicodedata.category(c) != "Mn")
    return unicodedata.normalize("NFC", s)


@F.pandas_udf(StringType())
def _strip_accents_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: None if x is None else strip_accents_py(x))


def _build_translate_map() -> tuple[str, str]:
    """char→char map for precomposed characters whose NFD strip is a single
    character (é→e, Ż→Z, …), generated from unicodedata at import so it is
    bit-identical to ``strip_accents_py`` on those characters."""
    src, dst = [], []
    for cp in range(0x80, 0x10000):
        ch = chr(cp)
        de = unicodedata.normalize("NFD", ch)
        if len(de) > 1:
            stripped = unicodedata.normalize(
                "NFC", "".join(c for c in de if unicodedata.category(c) != "Mn")
            )
            if len(stripped) == 1 and stripped != ch:
                src.append(ch)
                dst.append(stripped)
    return "".join(src), "".join(dst)


_TRANSLATE_SRC, _TRANSLATE_DST = _build_translate_map()


def strip_accents_col(col: Column) -> Column:
    """Diacritics strip, entirely JVM-side (no Python in the hot path):

    * ``translate`` maps every precomposed accented character to its base
      (map generated from unicodedata, so it matches the reference's
      NFD→drop-Mn→NFC exactly for single-char strips);
    * ``regexp_replace(\\p{Mn})`` then removes freestanding combining marks
      (already-decomposed input).

    ``_strip_accents_udf`` remains as the reference implementation; a
    property test pins equality between the two.
    """
    return F.regexp_replace(
        F.translate(col, _TRANSLATE_SRC, _TRANSLATE_DST), r"\p{Mn}", ""
    )


def normalize_spaces(col: Column) -> Column:
    """Collapse any unicode whitespace runs to single spaces and trim."""
    return F.trim(F.regexp_replace(col, _UNICODE_WS, " "))


def _clean(col: Column) -> Column:
    return normalize_spaces(F.lower(strip_accents_col(col)))


def clean_name(col: Column) -> Column:
    return _clean(col)


def clean_email(col: Column) -> Column:
    return _clean(col)


def remove_parens(col: Column) -> Column:
    """Drop a trailing ``(...)`` parenthetical from a name."""
    return F.regexp_replace(col, r"([^\(]+)\s+\(([^\)]+)\)", "$1")


def unique_sorted(arr: Column) -> Column:
    """P5: sorted dedup of a string array (reference strings.go:12-25)."""
    return F.array_sort(F.array_distinct(arr))


def is_capitalized(col: Column) -> Column:
    """P7: first character uppercase (reference strings.go:36-39)."""
    first = F.substring(col, 1, 1)
    return (first == F.upper(first)) & (first != F.lower(first))


def name_key(name: Column, repo: Column, is_popular: Column) -> Column:
    """Blocking key for a name: popular names are repo-qualified.

    Popular (hot) names would otherwise form huge blocks; qualifying them by
    repo is the reference's skew-breaking trick
    (/root/reference/people.go:140-145, research pipeline.py:168-171). The
    rendered form matches ``NameWithRepo.String()``: ``{name, repo}``.
    """
    return F.when(is_popular, F.format_string("{%s, %s}", name, repo)).otherwise(name)

