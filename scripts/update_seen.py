"""Regenerate the registry's pinned seen-set snapshot.

Reads every ``CORRECTNESS_r*.json`` driver artifact at the repo root
and writes ``mapreduce_lab_spark/driver_seen.json`` with the union of
query names that have a driver row, the round count, and — since
round 12 — each query's LAST driver status. The builder runs this
once at round start and COMMITS the result; the registry reads only
the snapshot (never the artifacts), so ``queries()`` ordering cannot
change when the driver drops a new artifact mid-round.

Last-status semantics (VERDICT r11 #2): the resample rotation was
round-count luck, so a query whose only driver row was an ERROR
(e.g. ``ivf_train_codebook``'s r10 canonicalizer crash, fixed in r11
but never resampled) could stay officially red for many rounds. The
snapshot now records per-query last status so the registry can
front-load previously-errored queries into the driver prefix:

- ``err``  — the most recent driver row has a non-null ``err``
- ``fail`` — no error, but rows/schema/hash mismatch on the most
  recent row (a wrong-answer signal is as urgent as a crash)
- everything else (ok / rows-only-clean) is omitted from the
  ``last_bad`` list; only the bad set matters for ordering.

Usage: python scripts/update_seen.py
"""

from __future__ import annotations

import glob
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _row_is_bad(row: object) -> bool:
    if not isinstance(row, dict):
        return False
    err = row.get("err")
    # The driver writes err="no_oracle" for the rows-only class with
    # spark_rows populated — that's the documented weak check passing,
    # not a failure. Any OTHER err string is a real crash.
    if err is not None and err != "no_oracle":
        return True
    if err == "no_oracle" and row.get("spark_rows") is None:
        return True  # rows-only query that produced no countable rows
    # A False on any gate is a wrong-answer mismatch.
    return any(row.get(k) is False for k in ("rows_match", "schema_match", "hash_match"))


def main() -> None:
    seen: set[str] = set()
    rounds: list[str] = []
    last_status: dict[str, bool] = {}  # name -> bad? (latest artifact wins)
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(data, dict):
            seen.update(data.keys())
            rounds.append(os.path.basename(path))
            for name, row in data.items():
                last_status[name] = _row_is_bad(row)
    out = {
        "rounds": len(rounds),
        "source_artifacts": rounds,
        "seen": sorted(seen),
        "last_bad": sorted(n for n, bad in last_status.items() if bad),
    }
    dest = os.path.join(ROOT, "mapreduce_lab_spark", "driver_seen.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"wrote {dest}: {len(seen)} seen queries over {len(rounds)} rounds; "
        f"last_bad={out['last_bad']}"
    )


if __name__ == "__main__":
    main()
