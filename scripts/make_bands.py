#!/usr/bin/env python3
"""Generate BANDS.json — machine-readable per-lane bench bands.

The 2x-rule gate ("no lane above 2x any best recorded reading") used to
live implicitly across bench_r*.json files and BASELINE.md prose, making
every noise flag an archaeology session. This script folds the committed
readings of record into one artifact:

    BANDS.json = { protocol, sources, lanes: { name: {min, max, n} } }

graft.Bench reads it (SPARK_GRAFT_BANDS, default ./BANDS.json) and emits
a "flags" array of lanes whose wall exceeds 2 x band min — the gate is
"above 2x the BEST recorded reading", so band MIN is the reference, and
adjudication becomes a diff instead of a hunt.

Usage: python3 scripts/make_bands.py [bench_r*.json ...]
       (no args: every bench_r*.json in the repo root)

Re-run after a round's quiet-box bench is committed so new lanes get
bands and improved readings tighten existing ones (min only ever
decreases; max only ever increases — bands widen with evidence).
"""
import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    paths = sys.argv[1:] or sorted(glob.glob(os.path.join(ROOT, "bench_r*.json")))
    lanes: dict = {}
    sources = []
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        qs = d.get("queries") or {}
        oks = d.get("ok") or {}
        if not qs:
            continue
        sources.append(os.path.basename(p))
        for name, sec in qs.items():
            # a failed lane's wall is not a reading (ok:false = error path)
            if oks and oks.get(name) is False:
                continue
            b = lanes.setdefault(name, {"min": sec, "max": sec, "n": 0})
            b["min"] = min(b["min"], sec)
            b["max"] = max(b["max"], sec)
            b["n"] += 1
    out = {
        "protocol": (
            "local[32] sf0.1 quiet-box FULL-suite runs; band = min/max "
            "over the committed bench_r*.json readings of record; gate = "
            "flag a lane whose wall exceeds 2x band min AND by more than "
            "1s absolute (the 'no lane above 2x any best recorded "
            "reading' rule, with a materiality floor: sub-second lanes "
            "rove 2-4x from scheduling noise). Lanes without a band are "
            "new this round and get one at the next commit. Bands are "
            "comparable ONLY to full-suite runs: a SPARK_GRAFT_ONLY "
            "subset runs lanes on a cold JIT and reads short lanes 2-4x "
            "hot (r14 measured: mix_temperature_subword 4.3-6.4s subset "
            "vs 2.5s in the same box's full run) — adjudicate flags by "
            "re-running the FULL suite on a quiet box, never a subset."
        ),
        "sources": sources,
        "lanes": {k: lanes[k] for k in sorted(lanes)},
    }
    dest = os.path.join(ROOT, "BANDS.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"BANDS.json: {len(lanes)} lanes from {len(sources)} runs -> {dest}")


if __name__ == "__main__":
    main()
