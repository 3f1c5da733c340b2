"""Compare two bench detail files and report per-query scaling.

Usage:
    python scripts/scale_ratio.py SMALL_DETAIL.json BIG_DETAIL.json [factor]

``factor`` is the data-size ratio between the two runs (default 10).
For each query present in both, prints warm time at each scale and
the ratio normalized by ``factor``: 1.0 = perfectly linear, < 1 =
sublinear (fixed overheads amortizing), > 2 = the VERDICT-r3 red
line ("no query >2x projected linear scaling without a documented
reason").
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rows = []
    for name, t_small in small["queries"].items():
        t_big = big["queries"].get(name)
        if t_big is None or t_small <= 0:
            continue
        rows.append((t_big / t_small / factor, name, t_small, t_big))
    rows.sort(reverse=True)
    print(f"{'norm-ratio':>10}  {'small_s':>8}  {'big_s':>8}  query")
    for r, name, ts, tb in rows:
        flag = "  <-- >2x linear" if r > 2 else ""
        print(f"{r:10.2f}  {ts:8.3f}  {tb:8.3f}  {name}{flag}")
    total_s = sum(small["queries"][n] for _, n, _, _ in rows)
    total_b = sum(big["queries"][n] for _, n, _, _ in rows)
    print(f"\ntotals: {total_s:.1f}s -> {total_b:.1f}s "
          f"(norm ratio {total_b / total_s / factor:.2f})")


if __name__ == "__main__":
    main()
