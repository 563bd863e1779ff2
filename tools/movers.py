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

Chain mode (round-14, r13 verdict item 1): pass the committed
bench_chain.jsonl (anchor-first ordered clean references) as the
reference to print every link's common-subtotal ratio plus the
composed chained_ratio_vs_anchor — the phase-corrected position of the
candidate vs the persistent r12 anchor, the same arithmetic Bench
embeds in its JSON (MoversChainSpec pins both):

  python3 tools/movers.py bench_chain.jsonl <candidate.json> [floor_sec]

The pairwise movers report then runs against the chain's LAST node
(the current promoted reference).
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


def load_chain(path):
    nodes = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                nodes.append(json.loads(line))
    if not nodes:
        raise SystemExit(f"no JSON lines in {path}")
    return nodes


def common_sum_ratio(ref_q, cand_q):
    """Bench.commonSumRatio: shared positive-time keys only (failed
    queries carry -1.0 sentinels)."""
    common = [k for k in ref_q if k in cand_q
              and ref_q[k] > 0 and cand_q[k] > 0]
    if not common:
        return None, []
    return (sum(cand_q[k] for k in common) / sum(ref_q[k] for k in common),
            common)


def print_chain(nodes, cand):
    composed = 1.0
    profiles = [n["queries"] for n in nodes] + [cand["queries"]]
    labels = [f"chain[{i}] {n.get('value', '?')}s/{len(n['queries'])}"
              for i, n in enumerate(nodes)] + [
        f"candidate {cand.get('value', '?')}s/{len(cand['queries'])}"]
    for i in range(len(profiles) - 1):
        ratio, common = common_sum_ratio(profiles[i], profiles[i + 1])
        if ratio is None:
            raise SystemExit(
                f"broken chain link {labels[i]} -> {labels[i + 1]}: empty common set")
        composed *= ratio
        print(f"link {labels[i]} -> {labels[i + 1]}: "
              f"common {len(common)} ratio {ratio:.4f}")
    print(f"chained_ratio_vs_anchor: {composed:.4f} "
          f"(candidate vs {labels[0]}, phase-corrected)")


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    cand = load(sys.argv[2])
    if sys.argv[1].endswith(".jsonl"):
        nodes = load_chain(sys.argv[1])
        print_chain(nodes, cand)
        print()
        ref = nodes[-1]  # pairwise movers vs the current promoted reference
    else:
        ref = load(sys.argv[1])
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
