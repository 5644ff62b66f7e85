"""Deterministic synthetic transcript corpus (FIXTURES.md §1 recipe).

K latent persons emit conversations in the BASELINE.json input_hint schema
``(conv_id, turn_idx, role, text, tool, ts)``. Each person has a stable
name/email identity; a ``name:``/``email:`` line is embedded in the first
user turn with controlled noise — exactly the perturbations the reference
normalizes away (diacritics, case, extra whitespace; people.go:605-637):

* name noise: accented vs stripped spelling, UPPER/lower/Title case, doubled
  inner whitespace;
* email noise: case only;
* each person also alternates between two email variants, so recovering the
  full cluster requires composing email-blocking AND name-blocking.

Everything is hash-derived Spark-native expressions over ``spark.range`` —
no Python in the row path, no RNG state: the corpus is a pure function of
(n_convs, n_persons, seed), identical at any parallelism or partitioning
(the two-cluster-size scaling benchmark depends on this).

``typo_rate`` additionally corrupts a fraction of embedded names with a
character-level edit that exact blocking cannot absorb — used to exercise
the similarity-scoring (Jaro-Winkler) recall path; keep 0.0 for the exact
F1 gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

FIRSTS_ACC = [
    "José", "María", "Renée", "Łukasz", "Sören", "Ágnes", "Chloé", "Jürgen",
    "Núria", "Pável", "Zoë", "André", "Beatriz", "Çetin", "Dário", "Eloïse",
    "Félix", "Gaëlle", "Håkon", "Inés", "Jiří", "Kâmil", "Léna", "Mårten",
    "Noémie", "Òscar", "Pëtr", "Québin", "Raúl", "Stéphane", "Tomás", "Ulrike",
    "Valérie", "Wojciech", "Xavière", "Yusuf", "Zlatan", "Ingrid", "Brígida", "Cyrille",
]
LASTS = [
    "Garcia", "Nowak", "Okafor", "Tanaka", "Johansson", "Rossi", "Dubois", "Silva",
    "Kowalski", "Petrov", "Yamamoto", "Larsen", "Moretti", "Lefevre", "Santos", "Ivanov",
    "Keller", "Olsen", "Bianchi", "Moreau", "Costa", "Volkov", "Weber", "Nilsen",
    "Ferrari", "Fournier", "Almeida", "Sokolov", "Braun", "Berg", "Ricci", "Mercier",
    "Barros", "Popov", "Vogel", "Dahl", "Greco", "Roux", "Pires", "Orlov",
]
DOMAINS = ["corp.io", "mail.dev", "research.org", "opsteam.net", "dataworks.ai"]
TOOLS = ["search", "python", "browser", "calculator", "sql", "editor", "shell", "plot"]
FILLER = [
    "let's review the pipeline results",
    "the aggregation looks correct to me",
    "can you rerun the job with more partitions",
    "the shuffle stage is the bottleneck here",
    "please checkpoint before the join",
    "metrics dashboard shows a spike",
    "we should salt the hot keys",
    "broadcast the dimension table instead",
]
N_CHANNELS = 7


def _strip(s: str) -> str:
    import unicodedata

    t = "".join(c for c in unicodedata.normalize("NFD", s) if unicodedata.category(c) != "Mn")
    return unicodedata.normalize("NFC", t)


# The pool must stay collision-free after accent stripping — two spellings
# that normalize to the same string are genuinely one identity to the matcher
# (e.g. Ágnes/Agnès), which would break the latent ground truth.
assert len({_strip(s).lower() for s in FIRSTS_ACC}) == len(FIRSTS_ACC)


def _arr(values: list[str]) -> Column:
    return F.array(*[F.lit(v) for v in values])


def _pick(values: list[str], idx: Column) -> Column:
    return F.element_at(_arr(values), (idx % len(values) + 1).cast("int"))


def _h(seed: int, *cols) -> Column:
    """Deterministic non-negative hash stream."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 2000,
    n_persons: int = 200,
    seed: int = 42,
    typo_rate: float = 0.0,
) -> DataFrame:
    """Generate the transcript table (see module docstring)."""
    conv = spark.range(n_convs).withColumnRenamed("id", "cid")
    pid = (F.col("cid") % n_persons).alias("pid")
    conv = conv.select("cid", pid)

    # bijective pid → (first, last) so no two persons collide on a full name;
    # diagonal shift spreads last names across small person counts
    first_i = F.col("pid") % len(FIRSTS_ACC)
    last_i = (F.col("pid") + (F.col("pid") / len(FIRSTS_ACC)).cast("long")) % len(LASTS)
    suffix = F.when(
        F.col("pid") >= len(FIRSTS_ACC) * len(LASTS), (F.col("pid")).cast("string")
    ).otherwise(F.lit(""))
    first_acc = _pick(FIRSTS_ACC, first_i)
    first_plain = _pick([_strip(x) for x in FIRSTS_ACC], first_i)
    last = F.concat(_pick(LASTS, last_i), suffix)

    # noise selection per conversation
    nv = _h(seed, F.col("cid"), F.lit("noise")) % 5
    first_sel = F.when(nv % 2 == 0, first_acc).otherwise(first_plain)
    gap = F.when(nv == 3, F.lit("  ")).otherwise(F.lit(" "))
    full = F.concat(first_sel, gap, last)
    name_noised = (
        F.when(nv == 1, F.upper(full)).when(nv == 2, F.lower(full)).otherwise(full)
    )
    is_typo = F.lit(False)
    if typo_rate > 0:
        # deterministic single-char drop at position 3 for a hash-chosen slice
        is_typo = (_h(seed, F.col("cid"), F.lit("typo")) % 10_000) < int(typo_rate * 10_000)
        name_noised = F.when(
            is_typo, F.concat(F.substring(full, 1, 2), F.substring(full, 4, 10_000))
        ).otherwise(name_noised)

    # two email variants per person; case noise per conversation
    user_full = F.lower(F.concat(first_plain, F.lit("."), last))
    user_short = F.lower(F.concat(F.substring(first_plain, 1, 1), last))
    domain = _pick(DOMAINS, _h(seed, F.col("pid"), F.lit("d")))
    variant = _h(seed, F.col("cid"), F.lit("ev")) % 2
    local = F.when(variant == 0, user_full).otherwise(user_short)
    # typo'd conversations also carry a one-off anonymous email: the only
    # remaining evidence is the fuzzy name (exercises the similarity path)
    local = F.when(is_typo, F.concat(F.lit("anon"), F.col("cid").cast("string"))).otherwise(local)
    email = F.concat(
        local,
        F.lit("."),
        F.col("pid").cast("string"),
        F.lit("@"),
        domain,
    )
    email_noised = F.when(_h(seed, F.col("cid"), F.lit("ec")) % 3 == 0, F.upper(email)).otherwise(
        email
    )

    channel = F.concat(F.lit("chan"), (_h(seed, F.col("cid"), F.lit("ch")) % N_CHANNELS).cast("string"))
    conv = conv.select(
        "cid",
        "pid",
        F.format_string("%s-%09d", channel, F.col("cid")).alias("conv_id"),
        name_noised.alias("name_line"),
        email_noised.alias("email_line"),
    )

    # explode into turns
    n_turns = (_h(seed, F.col("cid"), F.lit("nt")) % 5 + 4).cast("int")
    turns = conv.withColumn("turn_idx", F.explode(F.sequence(F.lit(0), n_turns - 1))).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    )
    role = (
        F.when(F.col("turn_idx") % 3 == 0, "user")
        .when(F.col("turn_idx") % 3 == 1, "assistant")
        .otherwise("tool")
    )
    tool = F.when(
        role == "tool", _pick(TOOLS, _h(seed, F.col("cid"), F.col("turn_idx"), F.lit("t")))
    ).otherwise(F.lit(""))
    filler = _pick(FILLER, _h(seed, F.col("cid"), F.col("turn_idx"), F.lit("fl")))
    text = F.when(
        F.col("turn_idx") == 0,
        F.format_string("name: %s\nemail: %s\n%s", F.col("name_line"), F.col("email_line"), filler),
    ).otherwise(filler)
    # spread conversations over ~2 years so the recent/total split is exercised
    ts = F.timestamp_seconds(
        F.lit(1735689600) + (F.col("cid") % 17520) * 3600 + F.col("turn_idx") * 30
    )

    return turns.select(
        "conv_id",
        "turn_idx",
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def synth_labels(spark: SparkSession, n_convs: int, n_persons: int, seed: int = 42) -> DataFrame:
    """Ground truth: conv_id → latent person id (same derivation as above)."""
    conv = spark.range(n_convs).withColumnRenamed("id", "cid")
    channel = F.concat(F.lit("chan"), (_h(seed, F.col("cid"), F.lit("ch")) % N_CHANNELS).cast("string"))
    return conv.select(
        F.format_string("%s-%09d", channel, F.col("cid")).alias("conv_id"),
        (F.col("cid") % n_persons).alias("person"),
    )
