#!/usr/bin/env python3
"""Regenerate the committed per-query clean-band resource from one or
more certified-clean `bench_out/bench.json` records.

Usage: tools/bands.py bench1.json [bench2.json ...]

Writes src/main/resources/graft/bench_bands.json with each query's
MEDIAN time across the given clean runs (sf0.1, local[32] — the driver
config; `Bench` disarms replay at any other config). Refuses inputs
that self-label contaminated: a band measured under contention would
silently raise every replay threshold.
"""
import json
import statistics
import sys
import pathlib

def main(paths):
    runs = []
    all_names = set()
    for p in paths:
        d = json.loads(pathlib.Path(p).read_text())
        if d.get("contaminated"):
            sys.exit(f"{p}: self-labeled contaminated - not band material")
        # exact basename, not substring: "sf0.15" / "sf0.1_regen" must
        # NOT become band material (silent replay-threshold skew)
        if pathlib.PurePath(d.get("sf", "")).name != "sf0.1":
            sys.exit(f"{p}: sf is {d.get('sf')}, bands are sf0.1-only")
        if str(d.get("cpus")) != "32":
            # bands from a slower config silently raise every replay
            # threshold at the driver's 32-CPU runs
            sys.exit(f"{p}: cpus is {d.get('cpus')}, bands are local[32]-only")
        # a query whose final time was REPLACED by an end-of-suite rerun
        # (its in-suite original rides in original_sec) ran the rerun in
        # the SAME session. Under the OLD protocol that rerun read the
        # warm session memo (a 0.04 s "band" for a 3.5 s query would flag
        # every honest run), so those samples were dropped. Since commit
        # 5e07c24 Bench evicts the memo before replays/re-runs and stamps
        # the record with memo_evicted_replays — replaced samples in a
        # flagged record are clean cold measurements and KEEP (dropping
        # them can starve a query of band material entirely); unflagged
        # legacy records stay filtered.
        if d.get("memo_evicted_replays"):
            runs.append(dict(d["queries"]))
        else:
            replaced = set(d.get("original_sec", {}))
            runs.append({k: v for k, v in d["queries"].items()
                         if k not in replaced})
        # the name universe comes from the UNFILTERED catalog: a query
        # replaced in EVERY input must hit the no-sample exit below, not
        # silently vanish from the written bands (surfacing later as a
        # confusing BenchSpec keyset failure)
        all_names.update(d["queries"])
    names = sorted(all_names)
    bands = {}
    for n in names:
        vals = [r[n] for r in runs if n in r and r[n] >= 0]
        if not vals:
            sys.exit(f"{n}: no clean unreplaced sample in any input — "
                     "take another quiet run")
        bands[n] = round(statistics.median(vals), 3)
    out = pathlib.Path(__file__).resolve().parent.parent / \
        "src/main/resources/graft/bench_bands.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    # json.dumps, not hand-built strings: a query name with a quote or
    # backslash must round-trip (the Scala side escapes via jsonStr)
    out.write_text(json.dumps(bands, indent=2, sort_keys=True) + "\n")
    print(f"wrote {out} ({len(bands)} bands from {len(runs)} run(s))")

if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    main(sys.argv[1:])
