#!/usr/bin/env python3
"""Bench regression triage: compare the current BENCH.json per-entry
MEDIANS (the bursty-host-resistant clock) against a previous round's
bench artifact, flag entries whose median regressed past a factor.

Usage: python3 tools/bench_compare.py [prev.json] [cur.json] [factor]
  prev defaults to the newest BENCH_r*.json; cur to BENCH.json;
  factor to 1.5.

Prior-round artifacts carry either the driver wrapper shape
({"parsed": {...}}) or the raw bench JSON; per-entry values are either
scalars (min-of-N, older rounds) or [min, median, spread] bands.
Medians compare against medians when both sides have them; otherwise
the comparison degrades to min-vs-min and says so.
"""
import glob
import json
import re
import sys


def load(path):
    # a driver BENCH_r{N}.json holds only the ~2 kB stdout tail (the
    # top-12 compact line); the sibling BENCH_full_r{N}.json the bench
    # writes alongside carries every entry's bands — prefer it
    m = re.search(r"BENCH_r(\d+)\.json$", path)
    if m:
        full = path.replace("BENCH_r", "BENCH_full_r")
        try:
            with open(full) as f:
                d = json.load(f)
            print(f"== using full per-entry archive {full}")
            return _maps(d)
        except (OSError, ValueError):
            pass
    return _maps(json.load(open(path)))


def _maps(d):
    if "parsed" in d and d["parsed"]:
        d = d["parsed"]
    # round-11 Bench flags host-contaminated sweeps (> 1.5x the
    # fastest warm sweep); a flagged archive's medians are suspect
    # (the round-10 459.9 s sweep poisoned every median silently)
    if d.get("contaminated_sweeps"):
        print(f"== WARNING: archive has contaminated sweeps "
              f"{d['contaminated_sweeps']} - treat its medians as suspect")
    mins = d.get("queries", {})
    meds = d.get("queries_median", {})
    # round-13 archives carry a self-median map: raw median minus the
    # memoized-artifact builds the entry paid — the like-for-like
    # clock (a shared chain moving between family members across
    # rounds is not a regression)
    selfs = d.get("queries_self_median", {})
    # band-shaped queries ([min, median, spread]) also carry medians
    if mins and isinstance(next(iter(mins.values())), list):
        meds = {k: v[1] for k, v in mins.items()}
        mins = {k: v[0] for k, v in mins.items()}
    return mins, meds, selfs


def main():
    args = sys.argv[1:]
    rounds = sorted(
        (p for p in glob.glob("BENCH_r*.json")
         if re.search(r"_r(\d+)\.json$", p)),
        key=lambda p: int(re.search(r"_r(\d+)\.json$", p).group(1)))
    cur_path = args[1] if len(args) > 1 else "BENCH.json"
    cmin, cmed, cself = load(cur_path)
    if len(args) > 0:
        prev_path = args[0]
        pmin, pmed, pself = load(prev_path)
    else:
        # walk archives newest-first and SKIP any whose per-entry map
        # equals the current run's — the newest BENCH_r{N}.json is
        # usually the driver's copy of THIS round's BENCH.json, and
        # round 8's compare ran against itself (vacuous "0 regressions")
        prev_path, pmin, pmed, pself = None, {}, {}, {}
        for p in reversed(rounds):
            a, b, c = load(p)
            if (a, b) == (cmin, cmed):
                print(f"== skipping {p}: identical to {cur_path} "
                      "(same run archived)")
                continue
            prev_path, pmin, pmed, pself = p, a, b, c
            break
        if prev_path is None:
            print("== no prior-round archive distinct from current run")
            sys.exit(0)
    factor = float(args[2]) if len(args) > 2 else 1.5
    if pself and cself:
        clock, prev, cur = "self-median", pself, cself
    elif pmed and cmed:
        clock, prev, cur = "median", pmed, cmed
    else:
        clock, prev, cur = "min", pmin, cmin
    common = sorted(set(prev) & set(cur))
    flagged = [(k, prev[k], cur[k]) for k in common
               if cur[k] > prev[k] * factor and cur[k] > 0.5]
    print(f"== {clock}-clock compare {prev_path} -> {cur_path}: "
          f"{len(common)} common entries, "
          f"{len(set(cur) - set(prev))} new, flag factor {factor}")
    if not flagged:
        print("== no regressions")
    for k, p, c in sorted(flagged, key=lambda r: -(r[2] / r[1])):
        print(f"REGRESSED {k}: {p:.2f}s -> {c:.2f}s ({c / p:.1f}x)")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
