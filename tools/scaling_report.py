#!/usr/bin/env python3
"""Scaling report over a dual-SF bench_out.json.

Reads the bench artifact (primary SF per-query times + the smaller-SF
secondary pass from the same JVM) and prints per-query big/small ratios,
flagging rows whose ratio exceeds the plausibility cap once times are
above the fixed per-query session floor. For a 10x data step the cap is
~12x (10x + slack); rows above it are either a plan problem (super-linear
operator) or measurement noise, and each one needs a diagnosis before the
round's scaling claim stands (VERDICT r5 item 1).
"""
import json
import sys

FLOOR = 0.15   # sec; fixed per-query session cost (Bench.OverheadFloor)
CAP = 12.0     # plausibility cap for a 10x data step (Bench.RatioCap)


def main(path: str) -> None:
    with open(path) as f:
        b = json.loads(f.read())
    big, small = b["queries"], b.get("queries_small", {})
    if not small:
        sys.exit(f"{path} has no queries_small — not a dual-SF artifact")
    rows = []
    for name, t_big in big.items():
        t_small = small.get(name)
        if t_small is None:
            continue
        ratio = t_big / max(t_small, FLOOR)
        rows.append((ratio, name, t_big, t_small))
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] > CAP]
    print(f"sf={b.get('sf')} small={b.get('sf_small')} "
          f"total={b['value']:.1f}s total_small={b.get('total_small', 0):.1f}s "
          f"queries={len(rows)}")
    print(f"{'query':<28}{'big_s':>8}{'small_s':>9}{'ratio':>7}")
    for ratio, name, t_big, t_small in rows[:25]:
        mark = "  <-- over cap" if ratio > CAP else ""
        print(f"{name:<28}{t_big:>8.2f}{t_small:>9.2f}{ratio:>7.1f}{mark}")
    med = sorted(r[0] for r in rows)[len(rows) // 2]
    print(f"\nmedian ratio {med:.2f}; {len(flagged)} over the {CAP:.0f}x cap")
    if b.get("outliers"):
        print("spliced outliers:", json.dumps(b["outliers"]))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "bench_out.json")
