"""Regenerate the registry's pinned seen-set snapshot.

Reads every ``CORRECTNESS_r*.json`` driver artifact at the repo root
and writes ``mapreduce_lab_spark/driver_seen.json`` with the union of
query names that have a driver row plus the round count. The builder
runs this once at round start and COMMITS the result; the registry
reads only the snapshot (never the artifacts), so ``queries()``
ordering cannot change when the driver drops a new artifact mid-round.

Usage: python scripts/update_seen.py
"""

from __future__ import annotations

import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    seen: set[str] = set()
    rounds: list[str] = []
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(data, dict):
            seen.update(data.keys())
            rounds.append(os.path.basename(path))
    out = {
        "rounds": len(rounds),
        "source_artifacts": rounds,
        "seen": sorted(seen),
    }
    dest = os.path.join(ROOT, "mapreduce_lab_spark", "driver_seen.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {dest}: {len(seen)} seen queries over {len(rounds)} rounds")


if __name__ == "__main__":
    main()
