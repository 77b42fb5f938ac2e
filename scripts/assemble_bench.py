#!/usr/bin/env python3
"""Assemble BENCH_local_rN.json from 3 raw Bench stdout captures.

Usage: python3 scripts/assemble_bench.py out.json run1.txt run2.txt run3.txt

Each runN.txt is the stdout of one `sbt -batch "runMain graft.Bench"` run
(the big JSON line is extracted). The assembled artifact mirrors
BENCH_local_r9.json: queries/heavies/load from the MIN-total run, all
three run totals recorded under `runs`.
"""
import json, re, sys

def big_line(path):
    for l in open(path):
        l = re.sub(r'^\[info\]\s*', '', l.strip())
        if l.startswith('{"metric":"total"') and '"queries"' in l:
            return json.loads(l)
    raise SystemExit(f"no bench line in {path}")

out, paths = sys.argv[1], sys.argv[2:]
runs = [big_line(p) for p in paths]
best = min(runs, key=lambda r: r["value"])
best["runs"] = [round(r["value"], 3) for r in runs]
# lifecycle cost PER RUN (round 17): run 1 builds the scale-factor's asset
# artifacts, later runs load — the min run usually reads 0, so the
# per-run record keeps the build cost visible instead of erased
best["asset_lifecycle"] = [
    {"run": i + 1,
     "asset_builds_n": r.get("asset_builds_n", 0),
     "asset_build_sec": r.get("asset_build_sec", 0.0)}
    for i, r in enumerate(runs)]
best["note"] = ("min-of-%d full Bench runs on final HEAD; queries/heavies/load "
                "from the min run; each run is itself a per-query min of two "
                "timed passes after a JIT warm-up pass") % len(runs)
json.dump(best, open(out, "w"), indent=None)
print(out, "<-", best["runs"], "min", round(best["value"], 2))
