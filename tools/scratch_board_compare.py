"""Scratch: compare two bench detail JSONs per query (markdown table),
with the canary/noise flags of each window printed alongside — the
re-measure board generator for OPTIMIZATION_r14.md.

Usage: python tools/scratch_board_compare.py PREV.json NOW.json [MORE.json ...]
With >2 files, NOW is the per-query MINIMUM across files 2..N (the
bench's documented discipline for noise-flagged windows) and each
window's canary is listed.
"""
import json
import sys

prev = json.load(open(sys.argv[1]))
nows = [json.load(open(p)) for p in sys.argv[2:]]

for label, d in [("prev", prev)] + [(f"now{i}", d) for i, d in enumerate(nows)]:
    c = d.get("canary") or {}
    print(
        f"# {label}: total={d.get('value')} canary start={c.get('start')} "
        f"end={c.get('end')} flags={d.get('noise_flags')}"
    )

pq = prev["queries"]
nq: dict[str, float] = {}
for d in nows:
    for k, v in d["queries"].items():
        nq[k] = min(nq.get(k, float("inf")), v)

import math

ratios = []
print("\n| query | r13 best | r14 | speedup |")
print("|---|---|---|---|")
for k in sorted(set(pq) | set(nq)):
    a, b = pq.get(k), nq.get(k)
    r = (a / b) if a and b else None
    if r:
        ratios.append(r)
    print(f"| {k} | {a} | {b} | {f'{r:.2f}x' if r else '—'} |")
if ratios:
    g = math.exp(sum(math.log(r) for r in ratios) / len(ratios))
    med = sorted(ratios)[len(ratios) // 2]
    print(f"\ngeomean {g:.3f}x  median {med:.3f}x  n={len(ratios)}")
drains = [d.get("streaming_drain") for d in nows if d.get("streaming_drain")]
print(f"streaming_drain: prev {prev.get('streaming_drain')} now min {min(drains) if drains else None}")
