#!/usr/bin/env python3
"""Movers audit between two bench JSON lines (the round-close routine
from the round-9 verdict, mechanized): compare per-query times, print
every query that moved >1.3x (either direction) above a floor, plus the
common-query sum ratio and the probe factors of both runs — the two
numbers that separate broad window drift (ratio tracks the probes,
mover names scatter) from a structural regression (a mover persists
across windows while the ratio doesn't explain it).

  python3 tools/movers.py <reference.json> <candidate.json> [floor_sec]

Accepts either the full bench line or the compact top-slowest line
(the audit then covers the intersection and says so).
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    raise SystemExit(f"no JSON line in {path}")


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    ref, cand = load(sys.argv[1]), load(sys.argv[2])
    floor = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    qr, qc = ref["queries"], cand["queries"]
    common = sorted(set(qr) & set(qc))
    if not common:
        raise SystemExit("no common queries")
    for name, r in (("reference", ref), ("candidate", cand)):
        print(f"{name}: total {r['value']:.1f}s n={len(r['queries'])} "
              f"probes ({r.get('host_factor', '?')}, {r.get('shuffle_factor', '?')}, "
              f"{r.get('scan_factor', '?')}) clean={r.get('window_clean', '?')}")
    sr, sc = sum(qr[k] for k in common), sum(qc[k] for k in common)
    partial = " (PARTIAL: compact line, slowest-only)" if (
        len(common) < min(len(qr), len(qc))) else ""
    print(f"common ({len(common)} queries){partial}: "
          f"ref {sr:.1f}s cand {sc:.1f}s ratio {sc / sr:.3f}")
    movers = [(qc[k] / qr[k], k, qr[k], qc[k]) for k in common
              if max(qc[k], qr[k]) > floor
              and (qc[k] > 1.3 * qr[k] or qr[k] > 1.3 * qc[k])]
    if not movers:
        print(f"no >1.3x movers above {floor}s")
    for ratio, k, a, b in sorted(movers, reverse=True):
        print(f"  {ratio:5.2f}x  {k}  {a:.3f} -> {b:.3f}")
    newcomers = {k: qc[k] for k in qc if k not in qr}
    if newcomers:
        print(f"newcomers ({len(newcomers)}): "
              + ", ".join(f"{k} {v:.2f}s" for k, v in sorted(newcomers.items())))


if __name__ == "__main__":
    main()
