"""Transcript → identity-signature extraction (SURVEY §1.4, §7 step 3).

Input is the BASELINE.json input_hint table:
``transcripts(conv_id, turn_idx, role, text, tool, ts)``. The analog of the
reference's distinct-triplet discovery query (people.go:428-432) derives one
identity signature per conversation:

* ``repo``   — provenance channel (prefix of conv_id before '-'): the
  popular-name qualification scope, like the git repository was.
* ``name``   — the name-like token: first ``name: ...`` line in turn order.
* ``email``  — the email-like token: first email-shaped string in turn order.
* ``hash``   — sample provenance (the conv_id, like the sample commit hash).
* ``ts``     — max turn timestamp (drives the recent/total split).
* ``tools``  — sorted distinct tool set (similarity-mode feature).
* ``doc``    — turn texts joined in stable (conv_id, turn_idx) order
  (optional; MinHash shingle source).

Everything is native expressions — one hash aggregation per conversation, no
Python. Ordering never relies on partition order: the per-turn invariant
(text equality under stable (conv_id, turn_idx) order) is enforced by
sorting collected structs by turn_idx inside the aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NAME_LINE = r"(?m)^name:\s*(.+)$"
EMAIL_TOKEN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"


def channel_of(conv_id) -> F.Column:
    return F.regexp_extract(conv_id, r"^([^-]+)", 1)


def extract_signatures(
    transcripts: DataFrame, include_doc: bool = False, include_tools: bool = False
) -> DataFrame:
    """One signature row per conversation (see module docstring).

    The token regexes are gated behind ``contains`` probes — a substring
    scan is far cheaper than the regex NFA and CASE WHEN short-circuits in
    codegen, so turns without candidate tokens (most of a conversation)
    never pay the regex. ``tools``/``doc`` aggregation is opt-in: collect_set
    forces an ObjectHashAggregate (off the codegen path), and only the
    similarity mode consumes those columns.
    """
    name_tok = F.when(
        F.col("text").contains("name:"), F.regexp_extract("text", NAME_LINE, 1)
    ).otherwise(F.lit(""))
    email_tok = F.when(
        F.col("text").contains("@"), F.regexp_extract("text", EMAIL_TOKEN, 0)
    ).otherwise(F.lit(""))
    turns = transcripts.select(
        "conv_id",
        "turn_idx",
        "ts",
        name_tok.alias("name_tok"),
        email_tok.alias("email_tok"),
        F.coalesce("tool", F.lit("")).alias("tool"),
        *( [F.col("text")] if include_doc else [] ),
    )
    aggs = [
        F.min_by("name_tok", F.when(F.col("name_tok") != "", F.col("turn_idx"))).alias("name"),
        F.min_by("email_tok", F.when(F.col("email_tok") != "", F.col("turn_idx"))).alias("email"),
        F.max("ts").alias("ts"),
    ]
    if include_tools:
        aggs.append(
            F.array_sort(F.collect_set(F.when(F.col("tool") != "", F.col("tool")))).alias(
                "tools"
            )
        )
    if include_doc:
        aggs.append(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                    lambda s: s.text,
                ),
                "\n",
            ).alias("doc")
        )
    sig = turns.groupBy("conv_id").agg(*aggs)
    return sig.select(
        channel_of(F.col("conv_id")).alias("repo"),
        F.coalesce("name", F.lit("")).alias("name"),
        F.coalesce("email", F.lit("")).alias("email"),
        F.col("conv_id").alias("hash"),
        "ts",
        *( [F.col("tools")] if include_tools else [] ),
        *( [F.col("doc")] if include_doc else [] ),
        F.col("conv_id"),
    )
