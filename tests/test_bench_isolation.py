"""bench.py must survive a broken query: one crash voids one number,
never the artifact (VERDICT r2 item 2 — BENCH_r02 was lost this way)."""

import json
import os

import bench
from pgsync_spark.queries import REGISTRY, QueryDef


def test_bench_isolates_broken_query(spark, monkeypatch, capsys):
    def boom(spark, sf_dir):
        raise RuntimeError("deliberately broken")

    monkeypatch.setitem(REGISTRY, "broken_query", QueryDef(fn=boom, oracle=None))
    monkeypatch.setattr(
        bench, "HEADLINE", ["count_scan", "broken_query", "distinct_values"]
    )
    monkeypatch.setattr(bench, "STEADY_BATCHES", 1)
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    # keep the test on its subject (per-query fault isolation): skip the
    # scaling/synth sections, which would otherwise benchmark two more
    # SF dirs and write a synthesized corpus under /tmp
    monkeypatch.setenv("SPARK_GRAFT_SF_SMALL_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_SYNTH_SCALE", "0")

    bench.main()

    line = [
        ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")
    ][-1]
    out = json.loads(line)
    assert out["metric"] == "headline_queries_total"
    assert "broken_query" in out["errors"]
    assert "deliberately broken" in out["errors"]["broken_query"]
    # the healthy queries and the incremental section still produced numbers
    assert "count_scan" in out["queries"]
    assert "distinct_values" in out["queries"]
    assert "incremental_full_sync" in out["queries"]
    assert "incremental_cdc_batch" in out["queries"]
    assert "incremental_steady_batch" in out["queries"]
    # r5 verdict item 1: the artifact is noise-self-diagnosing — every
    # metric ships its raw per-run samples and an ambient canary is
    # timed at both ends of the run
    assert out["query_samples"]["count_scan"], "per-run samples recorded"
    assert len(out["query_samples"]["incremental_full_sync"]) == 3
    assert out["canary"]["start"] > 0 and out["canary"]["end"] > 0
    assert len(out["canary"]["start_samples"]) == bench.CANARY_RUNS
    assert out["canary"]["end_over_start"] > 0
    # the broken query produced no samples entry (it never completed)
    assert "broken_query" not in out["query_samples"]


def test_noise_flags_physical_plausibility():
    """The artifact self-flags physically implausible measurements:
    canary drift, larger-SF-beats-smaller inversions (the r5 driver
    window fingerprint), batch-size inversions, per-query spread."""
    flags = bench._noise_flags(
        {"start": 0.1, "end": 0.5, "end_over_start": 5.0},
        # q1: two of three samples slow -> the MEDIAN itself rides the
        # burst (one slow warmup sample alone must NOT flag — see q2
        # in the clean case below)
        {"q1": [1.0, 4.8, 5.0], "incremental_full_sync": [9.0, 1.0, 1.0]},
        {
            "full_sync_ratio_3x_vs_big": 0.94,
            "steady_batch_ratio_3x_vs_big": 0.88,
            "full_sync_ratio": 4.2,
        },
        {"event_ratio": 3.96, "time_ratio": 0.89, "steady_1x": 3.56},
        {"incremental_steady_batch": 6.41},
    )
    text = "\n".join(flags)
    assert "canary drift" in text
    assert "repeat-measurement drift" in text
    assert "q1" in text and "rides a noise burst" in text
    # min-of-3 full_sync cold/warm spread is expected, never flagged
    assert "incremental_full_sync" not in text
    assert text.count("scaling inversion") == 2  # both 3x inversions
    assert "batch-size inversion" in text

    # a clean run produces zero flags — q2's slow FIRST sample is
    # plan-compile warmup, which the median discards
    assert bench._noise_flags(
        {"start": 0.1, "end": 0.11, "end_over_start": 1.1},
        {"q1": [1.0, 1.1, 1.2], "q2": [1.66, 0.32, 0.28]},
        {
            "full_sync_ratio_3x_vs_big": 2.6,
            "steady_batch_ratio_3x_vs_big": 1.2,
            "full_sync_ratio": 4.0,
        },
        {"event_ratio": 3.96, "time_ratio": 1.2, "steady_1x": 3.56},
        {"incremental_steady_batch": 3.9},
    ) == []
