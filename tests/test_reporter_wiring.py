"""A7: the Reporter is wired into the hot path — build_persons commits the
drop counters and reduce_people the match/edge-class counters with the
reference's JSON report keys (people.go:141-167, matching.go:129-233)."""

import datetime as dt

from identity_matching_spark.operators.blacklist import Blacklist
from identity_matching_spark.plans.pipeline import PipelineConfig, run_pipeline
from identity_matching_spark.reporter import Reporter
from identity_matching_spark.sources.synth import synth_transcripts


def test_pipeline_emits_reference_report_keys(spark):
    rep = Reporter(spark)
    t = synth_transcripts(spark, n_convs=300, n_persons=40, seed=9)
    out = run_pipeline(
        spark, t, PipelineConfig(reference_time=dt.datetime(2026, 1, 1)), reporter=rep
    )
    n_members = out["membership"].count()
    report = rep.report()

    for key in (
        "people found",
        "popular names",
        "ignored names",
        "ignored emails",
        "people after filtering",
        "people matched by email",
        "popular emails found",
        "people matched by name",
        "popular names found",
        "graph edges",
    ):
        assert key in report, f"missing counter: {key}"

    assert report["people found"] >= report["people after filtering"] > 0
    assert report["people after filtering"] == n_members
    assert report["people matched by email"] >= 0
    assert report["graph edges"] >= 0


def test_build_persons_counts_drops(spark):
    rows = [
        ("r", "Alice", "alice@good.org", "h1", dt.datetime(2025, 1, 1)),
        ("r", "Bob", "bob@good.org", "h2", dt.datetime(2025, 1, 1)),
        ("r", "root", "root@good.org", "h3", dt.datetime(2025, 1, 1)),  # ignored name
        ("r", "Carol", "carol@1.2.3.4", "h4", dt.datetime(2025, 1, 1)),  # ignored email (IP)
    ]
    df = spark.createDataFrame(
        rows, "repo string, name string, email string, hash string, ts timestamp"
    )
    from identity_matching_spark.operators.people import build_persons

    rep = Reporter(spark)
    out = build_persons(df, Blacklist.default(), reporter=rep)
    kept = out.count()
    report = rep.report()
    assert report["people found"] == 4
    assert report["ignored names"] == 1
    assert report["ignored emails"] == 1
    assert report["people after filtering"] == kept == 2
