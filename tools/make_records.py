#!/usr/bin/env python3
"""Regenerate tools/bench_records.json — the per-query healthy-window
records that drive graft.Bench's best-of-2 auto-retry.

Usage: python3 tools/make_records.py BENCH_FULL_A.json [BENCH_FULL_B.json ...]

Element-wise min over the given BENCH_FULL-format files AND the current
records file (records only ratchet down: a drifted run must never raise
a record). Queries present in inputs but not in the current file are
added at their input min.
"""
import json
import sys
import os

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "bench_records.json")


def main():
    records = {}
    if os.path.exists(OUT):
        records = json.load(open(OUT))
    for path in sys.argv[1:]:
        run = json.load(open(path))
        qs = run.get("queries", run)  # accept a bare flat map too
        for name, sec in qs.items():
            if not isinstance(sec, (int, float)) or sec <= 0:
                continue
            records[name] = min(records.get(name, sec), sec)
    # separators without spaces: graft.Bench parses this file with the
    # same minimal regex as its child partials
    json.dump({k: round(v, 2) for k, v in sorted(records.items())},
              open(OUT, "w"), separators=(",", ":"))
    print(f"wrote {len(records)} records to {OUT}")


if __name__ == "__main__":
    main()
