"""Round-over-round full-surface diff (VERDICT r9 #3): take two
FULLSURFACE_r{n}.json artifacts, estimate the UNIFORM drift between
the two passes (the shared-VM CPU-steal signature is a flat
multiplier across unrelated query families — PERF.md documents it
three times in r9 alone), and flag only the queries that moved more
than the threshold AFTER that drift is divided out. Turns the manual
steal-vs-regression adjudication into one command.

Drift estimator: the MEDIAN of per-query ratios new/old over queries
present in both passes and slower than `--floor` (default 0.5 s) in
the OLD pass — sub-half-second timings are harness noise (±50%
observed on this box) and would swamp the median. The median is the
right center: a handful of genuine regressions can't drag it the way
a mean would.

Usage:
    python perf_compare_surface.py FULLSURFACE_r09.json FULLSURFACE_r10.json
    python perf_compare_surface.py old.json new.json --threshold 1.5 --floor 0.5

Output: a PERF.md-ready markdown block — the drift ratio, counts, and
one table row per de-drifted mover (>threshold either direction) —
followed by one machine-readable JSON line.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d:
        sys.exit(f"{path}: no 'queries' map — not a FULLSURFACE artifact")
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag movers beyond this de-drifted ratio (default 1.5)")
    ap.add_argument("--floor", type=float, default=0.5,
                    help="ignore queries faster than this in the OLD pass "
                         "when estimating drift AND when flagging (default 0.5 s)")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))

    basis = [n for n in shared if oq[n] >= args.floor]
    if not basis:
        sys.exit("no shared queries above the floor — nothing to compare")
    drift = statistics.median(nq[n] / oq[n] for n in basis)

    # retimed best-of-3 numbers from the new pass's second phase (the
    # r10->r11 automation): a mover whose RETIMED de-drifted ratio
    # falls back under the threshold is adjudicated environmental
    # (steal in the single-run pass), one that stays above is real
    retimed = new.get("retimed") or {}
    movers = []
    for n in basis:
        dedrifted = (nq[n] / oq[n]) / drift
        if dedrifted > args.threshold or dedrifted < 1.0 / args.threshold:
            rt = retimed.get(n)
            rt_ratio = (rt / oq[n]) / drift if rt else None
            verdict = (
                ""
                if rt is None
                else (
                    "environmental"
                    if 1.0 / args.threshold <= rt_ratio <= args.threshold
                    else "REAL"
                )
            )
            movers.append((n, oq[n], nq[n], dedrifted, rt, rt_ratio, verdict))
    movers.sort(key=lambda m: -m[3])

    tot_shared_old = sum(oq[n] for n in shared)
    tot_shared_new = sum(nq[n] for n in shared)
    print(f"## Full-surface diff: {args.old} -> {args.new}")
    print()
    print(f"- shared queries: {len(shared)} "
          f"({tot_shared_old:.1f} s -> {tot_shared_new:.1f} s like-for-like); "
          f"added: {len(added)}, removed: {len(removed)}")
    print(f"- uniform drift (median new/old over the {len(basis)} shared "
          f"queries >= {args.floor} s): **{drift:.3f}x** — "
          + ("environmental-looking (within the steal band)"
             if 0.8 <= drift <= 1.3 else "LARGE; investigate the session itself"))
    print(f"- de-drifted movers beyond {args.threshold}x: **{len(movers)}**")
    if movers:
        print()
        print("| query | old s | new s | de-drifted | retimed (bo3) | verdict |")
        print("|---|---|---|---|---|---|")
        for n, o, w, r, rt, rtr, v in movers:
            rt_s = f"{rt:.2f} ({rtr:.2f}x)" if rt is not None else "—"
            print(f"| {n} | {o:.2f} | {w:.2f} | {r:.2f}x | {rt_s} | {v or '—'} |")
    if added:
        print()
        print(f"- new this round: {', '.join(added)}")
    print()
    print(json.dumps({
        "metric": "full_surface_diff",
        "old": args.old, "new": args.new,
        "n_shared": len(shared), "drift": round(drift, 4),
        "threshold": args.threshold,
        "movers": {n: round(r, 3) for n, _, _, r, _, _, _ in movers},
        "verdicts": {n: v for n, _, _, _, rt, _, v in movers if rt is not None},
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
