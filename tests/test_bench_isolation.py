"""bench.py must survive a broken query: one crash voids one number,
never the artifact (VERDICT r2 item 2 — BENCH_r02 was lost this way)."""

import json
import os

import bench
from pgsync_spark.queries import REGISTRY, QueryDef
import pytest


@pytest.mark.slow
def test_bench_isolates_broken_query(spark, monkeypatch, capsys, tmp_path):
    def boom(spark, sf_dir):
        raise RuntimeError("deliberately broken")

    monkeypatch.setitem(REGISTRY, "broken_query", QueryDef(fn=boom, oracle=None))
    monkeypatch.setattr(
        bench, "HEADLINE", ["count_scan", "broken_query", "distinct_values"]
    )
    monkeypatch.setattr(bench, "STEADY_BATCHES", 1)
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    detail_path = str(tmp_path / "detail.json")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_DETAIL", detail_path)
    # keep the test on its subject (per-query fault isolation): skip the
    # scaling/synth sections, which would otherwise benchmark two more
    # SF dirs and write a synthesized corpus under /tmp
    monkeypatch.setenv("SPARK_GRAFT_SF_SMALL_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_SYNTH_SCALE", "0")

    bench.main()

    line = [
        ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")
    ][-1]
    # r6 verdict item 1: the stdout line must survive the driver's
    # ~2000-char tail capture (BENCH_r06.json parsed:null was the full
    # artifact blowing that budget)
    assert len(line) <= bench._COMPACT_BUDGET
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
    # the canary SUMMARY rides the compact line
    assert out["canary"]["start"] > 0 and out["canary"]["end"] > 0
    assert out["canary"]["end_over_start"] > 0
    assert out["detail"] == "detail.json"
    # r5 verdict item 1: the FULL artifact stays noise-self-diagnosing —
    # per-run samples and canary samples live in the detail side file
    with open(detail_path) as f:
        detail = json.load(f)
    assert detail["queries"] == out["queries"]
    assert detail["query_samples"]["count_scan"], "per-run samples recorded"
    assert len(detail["query_samples"]["incremental_full_sync"]) == 3
    assert len(detail["canary"]["start_samples"]) == bench.CANARY_RUNS
    # the broken query produced no samples entry (it never completed)
    assert "broken_query" not in detail["query_samples"]


def test_compact_line_fits_budget_at_real_size():
    """The compact line must hold EVERY metric of a full-size run
    (every HEADLINE query + incremental section + scaling/batch/canary
    summaries) inside the tail-capture budget, and shed only
    diagnostics when pathological error text would blow it."""
    queries = {name: 12.345 for name in bench.HEADLINE}
    queries.update(
        incremental_full_sync=15.773,
        incremental_cdc_batch=9.102,
        incremental_steady_batch=4.143,
    )
    full = {
        "metric": "headline_queries_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "sf": 0.1,
        "runs_per_query": 3,
        "queries": queries,
        "query_samples": {n: [12.1, 12.3, 14.9] for n in queries},
        "canary": {
            "start": 0.0712, "end": 0.0698, "end_over_start": 0.98,
            "start_samples": [0.07] * 5, "end_samples": [0.07] * 5,
        },
        "scaling": {
            "small_sf_dir": "/root/testdata/sf0.01",
            "full_sync_small": 1.29, "steady_batch_small": 3.24,
            "full_sync_small_samples": [1.3, 1.29, 1.31],
            "steady_batch_small_samples": [3.2] * 5,
            "full_sync_big": 4.68, "steady_batch_big": 4.14,
            "full_sync_ratio": 3.61, "steady_batch_ratio": 1.28,
            "synth3x_dir": "/tmp/synth", "full_sync_3x": 7.18,
            "steady_batch_3x": 5.27,
            "full_sync_3x_samples": [7.2] * 3,
            "steady_batch_3x_samples": [5.3] * 5,
            "full_sync_ratio_3x_vs_big": 1.53,
            "steady_batch_ratio_3x_vs_big": 1.27,
        },
        "batch_scaling": {
            "events_1x": 1800, "events_4x": 7128, "steady_1x": 4.1,
            "steady_4x": 5.2, "samples_1x": [4.1] * 5,
            "samples_4x": [5.2] * 5, "event_ratio": 3.96,
            "time_ratio": 1.27,
        },
        "streaming_drain": 15.5,
        "noise_flags": ["canary drift 0.45x between start and end: ..."],
    }
    c = bench._compact(dict(full), "/root/repo/BENCH_DETAIL.json")
    line = json.dumps(c, separators=(",", ":"))
    assert len(line) <= bench._COMPACT_BUDGET, len(line)
    # every metric present: medians (possibly 2dp-rounded — the FREE
    # shedding step that runs before any diagnostic is dropped),
    # ratios, drain, canary summary
    assert set(c["queries"]) == set(queries)
    assert all(
        abs(c["queries"][k] - queries[k]) <= 0.005 for k in queries
    )
    assert "query_samples" not in c  # bulk stays in the detail file
    # the RATIOS always survive shedding (the medians may slim to the
    # detail file as the query list grows — they ride there verbatim)
    assert c["scaling"]["full_sync_ratio"] == 3.61
    assert c["batch_scaling"]["time_ratio"] == 1.27
    # the canary outlives every other diagnostic: it is what
    # adjudicates a noisy driver window (r9), so at minimum its ratio
    # rides the line even when the medians had to slim
    assert c["canary"]["end_over_start"] == 0.98
    assert c["streaming_drain"] == 15.5
    # the flag COUNT always rides the line; the prose is the first
    # diagnostic shed as the query list grows (r8: 45 metrics) — it
    # lives in BENCH_DETAIL.json either way
    assert c["noise_flags_n"] == 1
    assert c["detail"] == "BENCH_DETAIL.json"

    assert c["noise_flags_n"] == 1

    # pathological error text sheds diagnostics, never metrics
    full["errors"] = {f"q{i}": "x" * 500 for i in range(40)}
    c = bench._compact(dict(full), "BENCH_DETAIL.json")
    line = json.dumps(c, separators=(",", ":"))
    assert len(line) <= bench._COMPACT_BUDGET, len(line)
    assert set(c["queries"]) == set(queries)


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


def test_compact_line_fits_with_many_extra_queries(tmp_path):
    """r7 advice: the shed loop needs levers past batch_scaling. A
    synthetic artifact with ~30 EXTRA hypothetical queries, full
    diagnostics, and a dozen errors must still compact to a line
    inside the budget — the per-query metrics always surviving."""
    queries = {name: 1.234567 for name in bench.HEADLINE}
    queries.update(
        {f"hypothetical_query_name_{i:02d}": 1.234567 for i in range(8)}
    )
    out = {
        "metric": "headline_queries_total",
        "value": sum(queries.values()),
        "unit": "sec",
        "sf": 0.1,
        "runs_per_query": 2,
        "queries": queries,
        "streaming_drain": 15.123,
        "scaling": {k: 1.234 for k in bench._SCALING_COMPACT},
        "batch_scaling": {k: 1.234 for k in bench._BATCH_COMPACT},
        "canary": {"start": 0.1, "end": 0.2, "end_over_start": 2.0},
        "noise_flags": [f"flag {i}: something noisy happened" for i in
                        range(5)],
        "errors": {f"query_{i}": "RuntimeError: " + "x" * 200 for i in
                   range(12)},
    }
    line = json.dumps(
        bench._compact(out, str(tmp_path / "d.json")),
        separators=(",", ":"),
    )
    assert len(line) <= bench._COMPACT_BUDGET
    c = json.loads(line)
    # the metrics themselves are never shed
    assert set(c["queries"]) == set(queries)
    assert c["noise_flags_n"] == 5
