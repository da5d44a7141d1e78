#!/usr/bin/env python3
"""Merge a fresh floors measurement into BENCH_FLOORS.json.

Usage: python3 tools/merge_floors.py <measured.json> [rebaseline,names]

Policy (the min-over-all-rounds discipline):
- a query absent from the committed floors enters at its measured time;
- a committed floor only moves DOWN (the gate gets stricter) — unless
  the query is named in the rebaseline list, where the measured value
  REPLACES the floor (for queries whose implementation changed, so the
  old floor prices retired code — the r10 verdict's adjudication for
  text_rolling_fingerprint/dedup_simhash);
- measured values <= 0 (failed runs) never enter.
"""
import json, sys

measured = json.load(open(sys.argv[1]))
rebase = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else set()
floors = json.load(open("BENCH_FLOORS.json"))

added, lowered, rebased = [], [], []
for q, v in sorted(measured.items()):
    if v is None or v <= 0:
        continue
    v = round(v, 3)
    if q in rebase:
        if floors.get(q) != v:
            rebased.append((q, floors.get(q), v))
            floors[q] = v
    elif q not in floors:
        added.append((q, v))
        floors[q] = v
    elif v < floors[q]:
        lowered.append((q, floors[q], v))
        floors[q] = v

with open("BENCH_FLOORS.json", "w") as f:
    json.dump(dict(sorted(floors.items())), f, indent=0)
    f.write("\n")

print(f"floors: {len(floors)} total")
for q, v in added: print(f"  ADD     {q} = {v}")
for q, o, v in rebased: print(f"  REBASE  {q}: {o} -> {v}")
for q, o, v in lowered: print(f"  LOWER   {q}: {o} -> {v}")
