#!/usr/bin/env python
"""Similarity-mode quality sweep (BENCH/BASELINE.md table).

Generates the 20%-typo corpus (character-level name edits + one-off
anonymous emails, so the fuzzy name is the ONLY recoverable signal), runs
the full pipeline across a grid of (jw_threshold, lsh bands, shingle_k),
and prints pairwise precision/recall/F1 against the latent persons.

Usage: PYTHONPATH=/root/repo python tools/similarity_sweep.py [grid|one]
"""

from __future__ import annotations

import datetime as dt
import itertools
import sys

from pyspark.sql import functions as F

from identity_matching_spark.eval import pairwise_prf
from identity_matching_spark.operators.people import normalize_signatures
from identity_matching_spark.operators.signatures import extract_signatures
from identity_matching_spark.plans.pipeline import PipelineConfig, run_pipeline
from identity_matching_spark.session import get_spark
from identity_matching_spark.sources.synth import synth_labels, synth_transcripts

N_CONVS, N_PERSONS, SEED, TYPO = 4000, 250, 7, 0.2


def conv_assignments(transcripts, out):
    sigs = normalize_signatures(extract_signatures(transcripts)).select(
        "conv_id", "repo", F.col("name_c").alias("name"), F.col("email_c").alias("email")
    )
    return (
        sigs.join(
            out["members"].select("repo", "name", "email", "component"),
            ["repo", "name", "email"],
        )
        .select("conv_id", "component")
        .distinct()
    )


def main() -> None:
    spark = get_spark(master="local[8]", shuffle_partitions=16, app_name="sim-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    t = synth_transcripts(
        spark, n_convs=N_CONVS, n_persons=N_PERSONS, seed=SEED, typo_rate=TYPO
    ).localCheckpoint(eager=True)
    labels = synth_labels(spark, N_CONVS, N_PERSONS, seed=SEED)

    def evaluate(cfg: PipelineConfig) -> dict:
        out = run_pipeline(spark, t, cfg)
        return pairwise_prf(conv_assignments(t, out).join(labels, "conv_id"))

    base = dict(reference_time=dt.datetime(2026, 1, 1))
    r = evaluate(PipelineConfig(**base))
    print(f"exact blocking only                  | P {r['precision']:.4f} R {r['recall']:.4f} F1 {r['f1']:.4f}")

    grid = itertools.product([0.93, 0.95], [16, 32], [2, 3])
    for jw, bands, k in grid:
        cfg = PipelineConfig(
            **base, similarity_mode=True, jw_threshold=jw, lsh_bands=bands,
            lsh_perms=64, lsh_shingle_k=k,
        )
        r = evaluate(cfg)
        print(
            f"LSH(perm=64,bands={bands:2d},k={k}) + JW>={jw} | "
            f"P {r['precision']:.4f} R {r['recall']:.4f} F1 {r['f1']:.4f}"
        )


if __name__ == "__main__":
    main()
