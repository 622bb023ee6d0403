#!/usr/bin/env python3
"""Per-query bench regression gate (round-9 verdict item 7): diff two
bench records and flag load-adjusted moves above a threshold, so a plan
regression surfaces from the tracked artifacts alone — no judge
re-adjudication needed.

Usage:
  python3 tools/bench_diff.py OLD.json NEW.json [threshold]

Accepts either artifact shape:
  - a driver BENCH_rN.json wrapper ({"parsed": {...}}), or
  - a bare Bench record (bench_detail.json: {"queries": {...}, "load":
    [before, after], ...}).
A record whose "queries" map is the compact {"n": N} fallback carries no
per-query data and is rejected with a pointer to bench_detail.json.

Load adjustment: ratio_adj = ratio / max(1, mean(load_new)/mean(load_old)).
A busier box on the NEW side discounts apparent regressions; a quieter
box never inflates them (a 2x move on an idle box is real). Dev tooling
only — not part of the engine.
"""
import json
import sys


def load_record(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
        if d is None:
            sys.exit(f"{path}: parsed=null (stdout tail overflow) — "
                     "use the round's bench_detail.json instead")
    qs = d.get("queries")
    if not isinstance(qs, dict) or set(qs) == {"n"}:
        sys.exit(f"{path}: no per-query map (compact fallback) — "
                 "use the round's bench_detail.json instead")
    load = d.get("load") or [None, None]
    return qs, load, d.get("git", "?"), d.get("sf", "?")


def mean_load(load):
    vals = [v for v in load if isinstance(v, (int, float))]
    return sum(vals) / len(vals) if vals else None


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old_qs, old_load, old_git, old_sf = load_record(sys.argv[1])
    new_qs, new_load, new_git, new_sf = load_record(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0

    lo, ln = mean_load(old_load), mean_load(new_load)
    factor = max(1.0, ln / lo) if lo and ln and lo > 0 else 1.0
    common = sorted(set(old_qs) & set(new_qs))
    added = sorted(set(new_qs) - set(old_qs))
    removed = sorted(set(old_qs) - set(new_qs))

    rows = []
    for q in common:
        t0, t1 = old_qs[q], new_qs[q]
        if t0 is None or t1 is None or t0 < 0 or t1 < 0:
            rows.append((q, t0, t1, None, None))  # errored run on a side
            continue
        if t0 == 0:
            continue
        ratio = t1 / t0
        rows.append((q, t0, t1, ratio, ratio / factor))

    flagged = [r for r in rows if r[4] is not None and r[4] > threshold]
    errored = [r for r in rows if r[3] is None]
    tot0 = sum(old_qs[q] for q in common if old_qs[q] and old_qs[q] > 0)
    tot1 = sum(new_qs[q] for q in common if new_qs[q] and new_qs[q] > 0)

    print(f"old: {sys.argv[1]} git={old_git} sf={old_sf} load={old_load}")
    print(f"new: {sys.argv[2]} git={new_git} sf={new_sf} load={new_load}")
    print(f"common={len(common)} added={len(added)} removed={len(removed)} "
          f"load_factor={factor:.2f} threshold={threshold}x")
    print(f"common-query total: {tot0:.1f} s -> {tot1:.1f} s "
          f"({tot1 / tot0:.2f}x raw, {tot1 / tot0 / factor:.2f}x load-adj)"
          if tot0 > 0 else "no comparable totals")
    if added:
        print("added:", ", ".join(added))
    if removed:
        print("removed:", ", ".join(removed))
    for q, t0, t1, _, _ in errored:
        print(f"ERRORED  {q}: old={t0} new={t1}")
    if not flagged:
        print(f"OK: no query moved >{threshold}x load-adjusted")
        return
    print(f"\nFLAGGED (> {threshold}x load-adjusted):")
    for q, t0, t1, ratio, adj in sorted(flagged, key=lambda r: -r[4]):
        print(f"  {q}: {t0:.2f} s -> {t1:.2f} s  ({ratio:.2f}x raw, {adj:.2f}x adj)")
    sys.exit(1)


if __name__ == "__main__":
    main()
