"""Scale-soak of the exactly-once streaming dedup pipeline at bench
batch sizes (VERDICT r6 item 3): the r6 20-epoch soak used 50-doc
batches; this drives N_EPOCHS x DOCS_PER_EPOCH (default 8 x 5000 —
each epoch the size of the whole sf0.1 documents table) through
start_dedup_stream with a store-backed MinHashIndex, compaction every
3 epochs, and the drift monitor on, measuring per-epoch wall time.

The claim under test is the one the r6 exponential-plan fix (eager
localCheckpoint leaf plans + segment compaction) makes: per-epoch
cost is O(batch), FLAT in the number of held epochs — at toy scale
the pre-fix curve was 3.7 -> 64s by batch 5, so a flat line here is
the fix proven at 100x the batch size.

Corpus shape per epoch: 90% unique docs (sf0.1 texts with every token
suffixed by the (epoch, doc) pair — token sets are fully DISJOINT
across docs, because at JACCARD_THRESHOLD=0.2 a merely-salted variant
of a 45-token doc is a legitimate near-dup and the whole batch would
drop), 10% exact repeats of epoch-0 docs — every epoch k>0 must drop
exactly ~10% cross-batch dups, so the probe path (not just the append
path) is exercised at full batch width every epoch.

Harness discipline this soak also demonstrates: files are staged
OUTSIDE the watched directory and renamed in — the default-trigger
stream lists the directory continuously between processAllAvailable
calls, and a half-written file staged in-place gets ingested as its
own partial epoch (observed: misaligned epochs + mass drops when the
renamed full file arrives as "duplicates" of its own torn prefix).

Usage: python scratch_soak_dedup_stream.py  (prints one JSON line;
paste the table into EXPLAIN.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

N_EPOCHS = 8
DOCS_PER_EPOCH = 5000
DUP_FRACTION = 0.1
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pgsync_spark import get_spark
    from pgsync_spark.functions.dedup_index import MinHashIndex
    from pgsync_spark.streaming.stream import start_dedup_stream

    spark = get_spark("dedup-soak")
    base = [
        (r["doc_id"], r["text"], r["lang"], r["source"])
        for r in spark.read.parquet(
            os.path.join(SF_DIR, "documents.parquet")
        ).collect()
    ][:DOCS_PER_EPOCH]
    n_dup = int(DOCS_PER_EPOCH * DUP_FRACTION)

    tmp = tempfile.mkdtemp(prefix="dedup_soak_")
    docs_dir = os.path.join(tmp, "docs")
    os.makedirs(docs_dir)

    def doc_text(k: int, i: int, text: str) -> str:
        # fully disjoint token sets across (k, i): unique docs never
        # collide, and drops are exactly the planted exact repeats
        return " ".join(f"{w}{k}x{i}" for w in text.split())

    def write_epoch(k: int) -> str:
        path = os.path.join(docs_dir, f"b{k:03d}.json")
        # stage OUTSIDE the watched dir: the running stream lists
        # docs_dir continuously and would ingest a half-written file
        stage = os.path.join(tmp, f"stage_b{k:03d}.json")
        with open(stage, "w") as f:
            for i, (did, text, lang, source) in enumerate(base):
                if k > 0 and i < n_dup:
                    body = doc_text(0, i, text)  # exact epoch-0 repeat
                else:
                    body = doc_text(k, i, text)
                rec = {
                    "doc_id": k * 1_000_000 + i,
                    "text": body,
                    "lang": lang,
                    "source": source,
                }
                f.write(json.dumps(rec) + "\n")
        os.replace(stage, path)
        return path

    index = MinHashIndex(spark, store_dir=os.path.join(tmp, "store"))
    q = start_dedup_stream(
        spark,
        index,
        docs_dir,
        os.path.join(tmp, "ckpt"),
        os.path.join(tmp, "out"),
        max_files_per_trigger=1,
        drift_column="source",
        compact_every=3,
    )
    epochs = []
    try:
        for k in range(N_EPOCHS):
            write_epoch(k)
            t0 = time.perf_counter()
            q.processAllAvailable()
            dt = round(time.perf_counter() - t0, 2)
            dec_dir = os.path.join(tmp, "out", "decisions", f"epoch={k}")
            drops = (
                spark.read.parquet(dec_dir).count()
                if os.path.isdir(dec_dir)
                else 0
            )
            segs = len(index._segments)
            epochs.append(
                {"epoch": k, "sec": dt, "drops": drops, "segments": segs}
            )
            print(
                f"# epoch {k}: {dt}s, {drops} drops, {segs} segments",
                file=sys.stderr,
            )
        out = {
            "metric": "dedup_stream_soak",
            "docs_per_epoch": DOCS_PER_EPOCH,
            "n_epochs": N_EPOCHS,
            "epochs": epochs,
            # flatness summary: last-3 median over first-3 median
            # (epoch 0 excluded from the early window: it is the cold
            # batch and holds no probe)
            "late_over_early": round(
                sorted(e["sec"] for e in epochs[-3:])[1]
                / sorted(e["sec"] for e in epochs[1:4])[1],
                2,
            ),
        }
        print(json.dumps(out))
    finally:
        q.stop()
        index.close()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
