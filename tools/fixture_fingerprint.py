#!/usr/bin/env python3
"""Session-start fixture-schema fingerprint check.

Round 10 lesson: the driver regenerated /root/testdata with events.ts
as TIMESTAMP_NTZ(us) (was TIMESTAMP(NANOS)) mid-round, and the change
surfaced as 5 hard errors + 2 silent wrong answers instead of one loud
diagnostic. This tool turns that class of drift into a single diff:

  python3 tools/fixture_fingerprint.py check    # diff vs FIXTURE_SCHEMAS.json
  python3 tools/fixture_fingerprint.py record   # (re)write FIXTURE_SCHEMAS.json

Run `check` at session start (and before trusting any correctness
claim). Exit 1 on any schema drift. The engine itself also normalizes /
fails loudly at the source boundary (Sources.table), so this is the
early-warning layer, not the only defense.
"""
import json, os, sys

import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECORD = os.path.join(ROOT, "FIXTURE_SCHEMAS.json")
SFS = ["sf0.001", "sf0.01", "sf0.1"]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def fingerprint(base="/root/testdata"):
    out = {}
    for sf in SFS:
        d = os.path.join(base, sf)
        if not os.path.isdir(d):
            continue
        for t in TABLES:
            p = os.path.join(d, f"{t}.parquet")
            if not os.path.exists(p):
                out[f"{sf}/{t}"] = "MISSING"
                continue
            s = pq.read_schema(p)
            out[f"{sf}/{t}"] = "; ".join(
                f"{f.name}:{f.type}" for f in s)
    return out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    now = fingerprint()
    if mode == "record":
        with open(RECORD, "w") as fh:
            json.dump(now, fh, indent=1, sort_keys=True)
        print(f"recorded {len(now)} table schemas -> {RECORD}")
        return 0
    if not os.path.exists(RECORD):
        print(f"no {RECORD}; run `record` first", file=sys.stderr)
        return 1
    with open(RECORD) as fh:
        want = json.load(fh)
    drift = []
    for k in sorted(set(want) | set(now)):
        if want.get(k) != now.get(k):
            drift.append(f"  {k}:\n    recorded: {want.get(k)}\n"
                         f"    current:  {now.get(k)}")
    if drift:
        print("FIXTURE SCHEMA DRIFT — re-verify every ts-dependent query "
              "and `record` once green:\n" + "\n".join(drift))
        return 1
    print(f"fixture schemas match ({len(now)} tables x SFs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
