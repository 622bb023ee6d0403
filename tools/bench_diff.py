#!/usr/bin/env python3
"""Per-query bench regression gate (round-9 verdict item 7): diff two
bench records and flag load-adjusted moves above a threshold, so a plan
regression surfaces from the tracked artifacts alone — no judge
re-adjudication needed.

Usage:
  python3 tools/bench_diff.py OLD.json NEW.json [threshold] [--md FILE]

--md FILE appends the diff as a markdown table to FILE (the PLANS.md
round-close ritual, round-10 verdict item 7). Records produced by the
min-of-2 Bench (round-10 verdict item 5) carry a "raw" map of [t1, t2]
pairs next to the min-based "queries" map; the comparison always uses
"queries" (the mins), and raw pairs are quoted for flagged movers.

Accepts either artifact shape:
  - a driver BENCH_rN.json wrapper ({"parsed": {...}}), or
  - a bare Bench record (bench_detail.json: {"queries": {...}, "load":
    [before, after], ...}).
A record whose "queries" map is the compact {"n": N} fallback carries no
per-query data and is rejected with a pointer to bench_detail.json.

Box-factor adjustment (round-13 verdict item 2): load stamps proved
misleading (r13's stamps were near-idle while the box ran 1.15x slow),
so the normalizer is now the PINNED CONTROL QUERIES — queries no round
touches, whose ratio measures the box, not the code:
  q10 (fixed-overhead anti-join), q22 (CPU-bound regex+md5 over
  documents), q01 (shuffle-bound lineitem aggregate)
ratio_adj = ratio / max(1, median(control ratios)). The median survives
one disturbed control; the 1.0 floor keeps a quieter new box from
discounting real movers (a 2x move on an idle box is real). Override
the set with --controls q10,q22 (e.g. for subset records). When NO
control is present on both sides, falls back to the old load-stamp
factor and says so. The control factor is printed as `ctl x` and only
movers above it flag. Dev tooling only — not part of the engine.
"""
import json
import os
import re
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
    raw = d.get("raw") if isinstance(d.get("raw"), dict) else {}
    peak = d.get("peak_mem") if isinstance(d.get("peak_mem"), dict) else {}
    return qs, load, d.get("git", "?"), d.get("sf", "?"), raw, peak


def mean_load(load):
    vals = [v for v in load if isinstance(v, (int, float))]
    return sum(vals) / len(vals) if vals else None


def main():
    argv = list(sys.argv[1:])
    md_path = None
    if "--md" in argv:
        i = argv.index("--md")
        # --md needs a following path operand; a trailing --md, or --md
        # swallowing what was meant as the threshold (a bare number), is a
        # usage error, not an IndexError (round-11 ADVICE)
        if i + 1 >= len(argv):
            sys.exit("--md requires a file path operand\n" + __doc__)
        md_path = argv[i + 1]
        # a numeric-LOOKING operand is almost certainly a misplaced
        # threshold — unless a file by that name actually exists (a
        # path like '2024' is legal), in which case take it as the path.
        # Plain-decimal regex, not float(): float() also accepts 'nan'/
        # 'inf'/scientific notation, none of which anyone types as a
        # threshold (round-12 ADVICE). Bare-dot forms ('.5', '5.') ARE
        # typed as thresholds, so the regex admits them too (round-13
        # review).
        if re.fullmatch(r"(\d+(\.\d*)?|\.\d+)", md_path) \
                and not os.path.exists(md_path):
            sys.exit(f"--md operand '{md_path}' looks like a threshold, "
                     "not a file path — put the threshold before --md\n"
                     + __doc__)
        del argv[i:i + 2]
    controls = ["q10", "q22", "q01"]
    if "--controls" in argv:
        i = argv.index("--controls")
        if i + 1 >= len(argv):
            sys.exit("--controls requires a comma-separated query list\n"
                     + __doc__)
        controls = [c for c in argv[i + 1].split(",") if c]
        del argv[i:i + 2]
    if len(argv) < 2:
        sys.exit(__doc__)
    old_qs, old_load, old_git, old_sf, old_raw, old_peak = load_record(argv[0])
    new_qs, new_load, new_git, new_sf, new_raw, new_peak = load_record(argv[1])
    threshold = float(argv[2]) if len(argv) > 2 else 2.0

    lo, ln = mean_load(old_load), mean_load(new_load)
    load_factor = max(1.0, ln / lo) if lo and ln and lo > 0 else 1.0
    # control ratios: only controls that RAN (>0) on both sides count —
    # ONE presence list drives both the median and the printed label
    present = [q for q in controls
               if isinstance(old_qs.get(q), (int, float))
               and isinstance(new_qs.get(q), (int, float))
               and old_qs[q] > 0 and new_qs[q] > 0]
    ctl_ratios = sorted(new_qs[q] / old_qs[q] for q in present)
    if ctl_ratios:
        mid = len(ctl_ratios) // 2
        ctl = (ctl_ratios[mid] if len(ctl_ratios) % 2
               else (ctl_ratios[mid - 1] + ctl_ratios[mid]) / 2)
        factor = max(1.0, ctl)
        factor_src = f"ctl {ctl:.2f}x (median of " + ", ".join(present) + ")"
    else:
        factor = load_factor
        factor_src = f"load {load_factor:.2f}x (NO control present on both sides)"
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

    # peak_mem mover gate (round-12 verdict item 4): a >2x growth in the
    # min-time pass's peak execution memory is the tripwire for a silent
    # sort/spill plan regression that sf0.1 wall time doesn't show.
    # Noise discipline: only min-of-2+ artifacts are compared (a raw pair
    # of length >= 2 on BOTH sides — single-pass scratch runs carry one
    # sample and one listener-race can own it), peaks under 32 MiB are
    # ignored (ratio-of-tiny noise), and offenders FLAG but never fail
    # the exit code — wall-time movers and newly-errored queries remain
    # the only hard gates.
    PEAK_FLOOR = 32 * 1024 * 1024
    peak_movers = []
    for q in common:
        p0, p1 = old_peak.get(q), new_peak.get(q)
        if not (isinstance(p0, (int, float)) and isinstance(p1, (int, float))):
            continue
        if len(old_raw.get(q, [])) < 2 or len(new_raw.get(q, [])) < 2:
            continue
        if p1 < PEAK_FLOOR or p0 <= 0:
            continue
        # floor the DENOMINATOR too: a sub-floor old-side peak (tiny
        # memory grants vary with co-tenant task concurrency) would
        # otherwise manufacture a huge ratio from pure grant noise
        # (round-13 review)
        if p1 / max(p0, PEAK_FLOOR) > threshold:
            peak_movers.append((q, p0, p1, p1 / max(p0, PEAK_FLOOR)))
    tot0 = sum(old_qs[q] for q in common if old_qs[q] and old_qs[q] > 0)
    tot1 = sum(new_qs[q] for q in common if new_qs[q] and new_qs[q] > 0)

    # a query that RAN in the old record but errors in the new one is a
    # regression in its own right — gate on it like a slowdown (ADVICE)
    new_broken = [(q, t0, t1) for q, t0, t1, r, _ in rows
                  if r is None and t0 is not None and t0 >= 0
                  and (t1 is None or t1 < 0)]

    def raw_note(raw, q):
        pair = raw.get(q)
        return f" raw={pair}" if pair else ""

    print(f"old: {argv[0]} git={old_git} sf={old_sf} load={old_load}")
    print(f"new: {argv[1]} git={new_git} sf={new_sf} load={new_load}")
    print(f"common={len(common)} added={len(added)} removed={len(removed)} "
          f"box_factor={factor:.2f} [{factor_src}; load stamps "
          f"{old_load}->{new_load}] threshold={threshold}x")
    print(f"common-query total: {tot0:.1f} s -> {tot1:.1f} s "
          f"({tot1 / tot0:.2f}x raw, {tot1 / tot0 / factor:.2f}x box-adj)"
          if tot0 > 0 else "no comparable totals")
    if added:
        print("added:", ", ".join(added))
    if removed:
        print("removed:", ", ".join(removed))
    for q, t0, t1, _, _ in errored:
        print(f"ERRORED  {q}: old={t0} new={t1}")

    if md_path:
        top = sorted((r for r in rows if r[3] is not None),
                     key=lambda r: -r[2])[:15]
        ratio_txt = (f"({tot1 / tot0:.2f}x raw, "
                     f"{tot1 / tot0 / factor:.2f}x box-adj)"
                     if tot0 > 0 else "(no comparable totals)")
        with open(md_path, "a") as f:
            f.write(f"\n### bench_diff {old_git} -> {new_git} "
                    f"(sf={new_sf}, box_factor={factor:.2f} [{factor_src}])\n\n")
            f.write(f"common={len(common)} total {tot0:.1f} s -> {tot1:.1f} s "
                    f"{ratio_txt}; "
                    f"added: {', '.join(added) or 'none'}; "
                    f"newly-errored: "
                    f"{', '.join(q for q, _, _ in new_broken) or 'none'}\n\n")
            f.write("| query | old s | new s | raw x | adj x | new raw pair "
                    "| peak MiB old->new |\n")
            f.write("|---|---|---|---|---|---|---|\n")
            for q, t0, t1, ratio, adj in top:
                p0, p1 = old_peak.get(q), new_peak.get(q)
                pk = (f"{p0 / 2**20:.0f}->{p1 / 2**20:.0f}"
                      if isinstance(p0, (int, float))
                      and isinstance(p1, (int, float)) else "-")
                f.write(f"| {q} | {t0:.2f} | {t1:.2f} | {ratio:.2f} | "
                        f"{adj:.2f} | {new_raw.get(q, '-')} | {pk} |\n")
            if peak_movers:
                f.write(f"\npeak_mem movers (> {threshold}x, advisory): "
                        + "; ".join(
                            f"{q} {p0 / 2**20:.0f}->{p1 / 2**20:.0f} MiB "
                            f"({r:.1f}x)" for q, p0, p1, r in peak_movers)
                        + "\n")
        print(f"markdown table appended to {md_path}")

    bad = False
    if new_broken:
        print(f"\nNEWLY ERRORED (ran in old record, -1 in new):")
        for q, t0, t1 in new_broken:
            print(f"  {q}: old={t0} new={t1}")
        bad = True
    if flagged:
        print(f"\nFLAGGED (> {threshold}x box-adjusted):")
        for q, t0, t1, ratio, adj in sorted(flagged, key=lambda r: -r[4]):
            print(f"  {q}: {t0:.2f} s -> {t1:.2f} s  ({ratio:.2f}x raw, "
                  f"{adj:.2f}x adj){raw_note(new_raw, q)}")
        bad = True
    if peak_movers:
        print(f"\nPEAK-MEM MOVERS (> {threshold}x min-time-pass peak; "
              "advisory, does not fail the gate):")
        for q, p0, p1, r in sorted(peak_movers, key=lambda x: -x[3]):
            print(f"  {q}: {p0 / 2**20:.0f} MiB -> {p1 / 2**20:.0f} MiB "
                  f"({r:.2f}x)")
    if not bad:
        print(f"OK: no query moved >{threshold}x box-adjusted, none newly errored")
        return
    sys.exit(1)


if __name__ == "__main__":
    main()
