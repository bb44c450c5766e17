#!/usr/bin/env python3
"""Drift-normalized bench comparison (round 12, VERDICT r11 #5).

Usage: python3 scripts/bench_compare.py BENCH_rA.json BENCH_rB.json [--top N]

Reads two driver bench artifacts (or raw `graft.Bench` output files),
extracts each run's per-query seconds and `calibration_sec` (the fixed
CPU-bound workload Bench times before the suite — see BENCH_NOTES), and
prints per-query ratios NORMALIZED by the calibration ratio, so host
drift between rounds is divided out mechanically instead of by forensic
reading. Queries missing from either side are listed, not silently
dropped. Exit code 0 always: this is a reporting tool, not a gate.
"""
import json
import re
import sys


def load(path):
    """Return (queries: dict name->sec, calibration_sec or None, total).

    Works on raw `graft.Bench` output, `bench_detail.json`, AND the
    driver's BENCH_rNN.json — whose `tail` keeps only the last couple
    of KB of output and can truncate the per-query line MID-LINE, so
    the map is scraped pair-by-pair (last occurrence of each query
    wins) rather than parsed as one JSON object. Partial coverage is
    then reported as only-in-one-side, never silently dropped.
    """
    text = open(path).read()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "tail" in doc:
            text = doc["tail"]
    except json.JSONDecodeError:
        pass
    queries = {}
    for m in re.finditer(r'"(q\d+\w*)":\s*([0-9.]+)', text):
        queries[m.group(1)] = float(m.group(2))
    # bench_detail.json carries per-query structs instead of flat seconds
    for m in re.finditer(r'"(q\d+\w*)":\{"median":([0-9.]+)', text):
        queries[m.group(1)] = float(m.group(2))
    # round-13+ detail also stamps each block with the host speed IT ran
    # under ("cal") — when BOTH sides carry it, per-query normalization
    # uses the per-block ratio (intra-suite drift) instead of the single
    # suite-level calibration
    percal = {}
    for m in re.finditer(r'"(q\d+\w*)":\{"median":[0-9.]+,"min":[0-9.]+,"cal":([0-9.]+)', text):
        percal[m.group(1)] = float(m.group(2))
    calib = total = None
    for m in re.finditer(r'"calibration_sec":\s*([0-9.]+)', text):
        calib = float(m.group(1))
    for m in re.finditer(r'\{"metric":"total","value":\s*([0-9.]+)', text):
        total = float(m.group(1))
    return queries, calib, total, percal


def main():
    argv = sys.argv[1:]
    top = 0
    if "--top" in argv:
        i = argv.index("--top")
        top = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    args = argv
    if len(args) != 2:
        sys.exit(__doc__)
    qa, ca, ta, pca = load(args[0])
    qb, cb, tb, pcb = load(args[1])
    if not qa or not qb:
        sys.exit(f"no per-query map found in {'both' if not qa and not qb else args[0] if not qa else args[1]}")
    drift = (cb / ca) if (ca and cb) else None
    print(f"# {args[0]} -> {args[1]}")
    # a truncated tail can clip the total line — report n/a, don't crash
    ta = f"{ta:.2f}s" if ta is not None else "n/a"
    tb = f"{tb:.2f}s" if tb is not None else "n/a"
    print(f"totals: {ta} -> {tb}  calibration: "
          f"{ca if ca is not None else 'n/a'} -> {cb if cb is not None else 'n/a'}"
          f"  drift ratio: {f'{drift:.3f}' if drift else 'UNKNOWN (raw ratios below)'}")
    shared = sorted(set(qa) & set(qb))
    only_a, only_b = sorted(set(qa) - set(qb)), sorted(set(qb) - set(qa))
    rows = []
    per_block = sum(1 for q in shared if q in pca and q in pcb)
    if per_block:
        print(f"per-block calibration on both sides for {per_block}/{len(shared)} "
              "shared queries (intra-suite drift divided out per query)")
    for q in shared:
        raw = qb[q] / qa[q] if qa[q] else float("inf")
        qdrift = (pcb[q] / pca[q]) if (q in pca and q in pcb and pca[q]) else drift
        norm = raw / qdrift if qdrift else raw
        rows.append((norm, raw, q, qa[q], qb[q]))
    rows.sort(reverse=True)
    shown = rows[:top] if top else rows
    print(f"{'query':40s} {'old_s':>8s} {'new_s':>8s} {'raw':>6s} {'norm':>6s}")
    for norm, raw, q, a, b in shown:
        flag = "  <-- >1.25x" if norm > 1.25 else ""
        print(f"{q:40s} {a:8.3f} {b:8.3f} {raw:6.2f} {norm:6.2f}{flag}")
    movers = [q for norm, _, q, _, _ in rows if norm > 1.25]
    sa = sum(qa[q] for q in shared)
    sb = sum(qb[q] for q in shared)
    if sa > 0:
        agg = (sb / sa / drift) if drift else sb / sa
        print(f"\nshared {len(shared)} queries: {sa:.1f}s -> {sb:.1f}s, "
              f"drift-normalized ratio {agg:.3f}")
    else:
        print(f"\nshared queries: none (or zero time) — no aggregate ratio")
    print(f">1.25x drift-normalized movers: {movers if movers else 'none'}")
    if only_a:
        print(f"only in {args[0]}: {only_a}")
    if only_b:
        print(f"only in {args[1]}: {only_b}")


if __name__ == "__main__":
    main()
