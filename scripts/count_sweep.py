"""Column-agnostic-consumer sweep: run ``count()`` on every batch query.

Round-13 postmortem (operators/events.py asof_join_cogroup): the
parity harness, the driver compare, and the sims all COLLECT query
results, so they only ever exercise column-referencing consumers. A
consumer that references none of the output columns — a bare
count(), a cached count, a subset write — drives Catalyst's column
pruning through the plan differently, and that path crashed the
self-cogroup as-of join for twelve rounds without any gate noticing
(the right child's non-grouping columns were pruned out from under
the pandas UDF).

This sweep is the missing consumer shape: every registered batch
query executed once with ``count()`` at sf0.001. Streaming replays
are excluded (their query functions drain a stream; the drained
memory-sink count is not a plan-shape probe). Run it after any
change that adds a Python-UDF operator (applyInPandas / cogroup /
mapInPandas) or touches how query inputs share scans.

Usage: python scripts/count_sweep.py [sf_dir]
Exit code 0 = all green.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    from mapreduce_lab_spark.session import get_spark
    from mapreduce_lab_spark import registry

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    registry.load_all()
    spark = get_spark("count-sweep", master="local[8]", shuffle_partitions=8)
    bad: list[tuple[str, str]] = []
    names = [n for n in registry.queries() if not n.startswith("streaming_")]
    for i, name in enumerate(names, 1):
        try:
            registry._QUERIES[name](spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001 - report and continue
            bad.append((name, str(e)[:200]))
            print(f"[{i}/{len(names)}] FAIL {name}", flush=True)
    print(f"swept {len(names)} queries at {sf_dir}; failures: {len(bad)}")
    for n, e in bad:
        print(f"  {n} :: {e}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
