#!/usr/bin/env python3
"""Regenerate tools/bench_records.json — the per-query healthy-window
records that drive graft.Bench's best-of-2 auto-retry — and maintain
tools/baro_history.json, the rolling barometer history.

Usage:
  python3 tools/make_records.py [--run-id runNN] [--force] BENCH_FULL.json [...]

Element-wise min over the given BENCH_FULL-format files AND the current
records file (records only ratchet down: a drifted run must never raise
a record). Queries present in inputs but not in the current file are
added at their input min.

r17 guards (the r16 verdict's item 3 — run 53's manually-ratcheted
records caused 38 retries on an average window because they came from
an exceptional one):
  * A BENCH_FULL with barometer violations (baro_viol non-empty) or
    failed queries is REFUSED — only barometer-healthy runs may
    ratchet. --force overrides, and is recorded in the provenance.
  * The written records carry a "_provenance" entry naming the run id,
    source files and violation state, so a record's pedigree is in the
    file, not in prose. (String-valued: graft.Bench's numeric-pair
    regex skips it by construction.)
  * With --run-id, the run's barometers are appended to
    baro_history.json keyed by that id, and the history is pruned to
    the last HISTORY_KEEP runs so adjudication bands stay
    recent-weighted (r16 verdict item 7).
"""
import json
import os
import re
import sys
from datetime import date

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "bench_records.json")
HISTORY = os.path.join(HERE, "baro_history.json")
HISTORY_KEEP = 20
BAROS = {"q69": "q69_grouped_quantiles", "d02": "d02_minhash_lsh"}


def health(run):
    """(ok, reason) for a BENCH_FULL dict."""
    viol = run.get("baro_viol", [])
    if isinstance(viol, int):  # short summary line form
        viol = ["<unnamed>"] * viol
    if viol:
        return False, "baro_viol=%s" % ",".join(viol)
    if run.get("failed"):
        return False, "failed=%s" % ",".join(run["failed"])
    return True, "baro_viol=0"


def append_history(run_id, run):
    """Append this run's barometers to baro_history.json, prune to the
    last HISTORY_KEEP runs (numeric run-id order; non-runNN keys like
    _doc are always kept)."""
    hist = {}
    if os.path.exists(HISTORY):
        hist = json.load(open(HISTORY))
    baro = run.get("barometers", {})
    children = sorted({k.split("_", 1)[0] for k in baro
                       if "_pre_" in k or "_post_" in k})
    entry = {}
    for g in children:
        entry[g] = {
            f"{phase}_{short}": baro.get(f"{g}_{phase}_{name}")
            for phase in ("pre", "post") for short, name in BAROS.items()}
    entry["verdict"] = "%s (%.2f s/%d)" % (
        "healthy" if health(run)[0] else "drifted",
        sum(v for v in run.get("queries", {}).values()
            if isinstance(v, (int, float))),
        len(run.get("queries", {})))
    hist[run_id] = entry
    runs = sorted((k for k in hist if re.fullmatch(r"run\d+", k)),
                  key=lambda k: int(k[3:]))
    for k in runs[:-HISTORY_KEEP] if len(runs) > HISTORY_KEEP else []:
        del hist[k]
    json.dump(hist, open(HISTORY, "w"), indent=1)
    print(f"baro_history: appended {run_id}, {len(hist)} entries kept")


def main():
    args = sys.argv[1:]
    force = "--force" in args
    args = [a for a in args if a != "--force"]
    run_id = None
    if "--run-id" in args:
        i = args.index("--run-id")
        run_id = args[i + 1]
        del args[i:i + 2]
    if not args:
        sys.exit("usage: make_records.py [--run-id runNN] [--force] "
                 "BENCH_FULL.json [...]")
    # One run id names ONE run: with multiple inputs each file's
    # append_history call would overwrite hist[run_id] and only the
    # last file's barometers would survive (r17 ADVICE).
    if run_id and len(args) > 1:
        sys.exit("REFUSED: --run-id with multiple inputs would keep "
                 "only the last file's barometers in baro_history.json"
                 "; pass one BENCH_FULL per run id")

    records, provenance = {}, []
    if os.path.exists(OUT):
        records = {k: v for k, v in json.load(open(OUT)).items()
                   if isinstance(v, (int, float))}
    for path in args:
        run = json.load(open(path))
        ok, reason = health(run)
        # History is a LOG, not a ratchet: a drifted run's barometers
        # are exactly what the history exists to document, so the
        # append happens before (and regardless of) the health gate.
        if run_id and "barometers" in run:
            append_history(run_id, run)
        if not ok and not force:
            sys.exit(f"REFUSED: {path} is not barometer-healthy "
                     f"({reason}); records ratchet only from healthy "
                     "runs (re-run with --force to override; its "
                     "barometers were still logged to history)")
        # Accept a bare flat {"name": sec} map too — but NEVER the
        # short summary-line form: its numeric keys (value, n,
        # retried, ...) would ratchet into bench_records.json as bogus
        # permanent records (r17 ADVICE). A summary line is detected
        # by its marker keys; it carries no per-query data, so there
        # is nothing to ratchet from it.
        if "queries" in run:
            qs = run["queries"]
        elif {"metric", "value", "n"} & run.keys():
            sys.exit(f"REFUSED: {path} looks like a summary line "
                     "without a \"queries\" map; pass the BENCH_FULL "
                     "artifact instead")
        else:
            qs = run
        for name, sec in qs.items():
            if not isinstance(sec, (int, float)) or sec <= 0:
                continue
            records[name] = min(records.get(name, sec), sec)
        provenance.append("%s %s%s" % (os.path.basename(path), reason,
                                       " FORCED" if not ok else ""))

    out = {k: round(v, 2) for k, v in sorted(records.items())}
    # Provenance value stays free of '}' and '"' so graft.Bench's
    # minimal object scan (first '{' to first '}') is unaffected.
    prov = "; ".join([f"ratcheted {date.today().isoformat()} "
                      f"run_id={run_id or 'unspecified'}"] + provenance)
    out["_provenance"] = prov.replace("}", "").replace('"', "")
    # separators without spaces: graft.Bench parses this file with the
    # same minimal regex as its child partials
    json.dump(out, open(OUT, "w"), separators=(",", ":"))
    print(f"wrote {len(out) - 1} records to {OUT}")
    print(f"provenance: {out['_provenance']}")


if __name__ == "__main__":
    main()
