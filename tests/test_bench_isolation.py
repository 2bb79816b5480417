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
