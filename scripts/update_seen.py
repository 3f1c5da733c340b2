"""Regenerate the registry's pinned seen-set snapshot.

Reads every ``CORRECTNESS_r*.json`` driver artifact at the repo root
and writes ``mapreduce_lab_spark/driver_seen.json`` with the union of
query names that have a driver row, the round count, each query's
LAST driver status, and — since round 13 — each query's oracle CLASS
and oracle-SQL SIGNATURE as of its last driver sample. The builder
runs this once at round start (BEFORE editing anything, so the live
registry still equals the tree the driver last ran) and COMMITS the
result; the registry reads only the snapshot (never the artifacts),
so ``queries()`` ordering cannot change when the driver drops a new
artifact mid-round.

Last-status semantics (VERDICT r11 #2): per-query last status so the
registry can front-load previously-errored queries into the driver
prefix:

- ``err``  — the most recent driver row has a non-null ``err``
- ``fail`` — no error, but rows/schema/hash mismatch on the most
  recent row (a wrong-answer signal is as urgent as a crash)
- everything else (ok / rows-only-clean) is omitted from the
  ``last_bad`` list; only the bad set matters for ordering.

Oracle-signature semantics (VERDICT r12 #1): last-bad front-loading
never resamples a query whose oracle was UPGRADED (rows-only -> full)
or REWRITTEN after an all-green history — ``bpe_train_merges``
graduated in r12 yet its whole driver record stayed rows-only-era.
The snapshot therefore records, per sampled query:

- ``last_class[name]``   — 'oracled' | 'rows_only', inferred from the
  query's most recent driver row (``err == "no_oracle"`` is the
  documented rows-only marker; a crashed row carries the previous
  snapshot's class forward, else the live class).
- ``oracle_sig[name]``   — ``registry.oracle_signatures()[name]`` at
  the time that query's newest artifact was folded. Refreshed ONLY
  when a NEW artifact contains the query (round start == the tree the
  driver ran, so live == last-sampled); otherwise carried verbatim
  from the previous snapshot, so a mid-round oracle edit shows up as
  a live-vs-snapshot mismatch and the registry front-loads it.
- ``sig_artifact[name]`` — which artifact the signature was taken at
  (the refresh key).
- ``stale_seed``         — one-time migration list: rewrites that
  predate signature tracking and whose last sample is older than the
  rewrite, so no signature can witness the change. Seed entries drop
  out automatically once a newer artifact samples the query.

The snapshot construction is the pure function ``build_snapshot``
(unit-tested in tests/test_harness_strictness.py); ``main`` only
feeds it the glob, the previous snapshot, and the live registry.

Usage: python scripts/update_seen.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# Oracles rewritten before signature tracking existed, after their
# last official sample (VERDICT r12 #1 names them): the two r12
# advice rewrites last sampled green in r11 under their OLD SQL, and
# bpe_token_counts, sampled green in r12 under the replace() rewrite
# that the r13 list_reduce fold replaced. Applied only when migrating
# a signature-less snapshot; dropped as soon as a newer artifact
# samples each query.
_BOOTSTRAP_STALE = [
    "bootstrap_mean_ci_revenue",
    "schema_evolution_census",
    "bpe_token_counts",
]


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


def _row_class(row: object) -> str | None:
    """'oracled' | 'rows_only' | None (crash — class unobservable)."""
    if not isinstance(row, dict):
        return None
    err = row.get("err")
    if err == "no_oracle":
        return "rows_only"
    if err is None:
        return "oracled"
    return None


def build_snapshot(
    artifacts: list[tuple[str, dict]],
    prev: dict,
    live_sig: dict[str, str],
    bootstrap_stale: list[str] = _BOOTSTRAP_STALE,
) -> dict:
    """Pure snapshot construction. ``artifacts`` is the ordered list of
    (basename, rows) driver artifacts, oldest first; ``prev`` is the
    previously committed snapshot (possibly empty / pre-signature);
    ``live_sig`` is the live registry's oracle_signatures()."""
    prev_sig: dict[str, str] = prev.get("oracle_sig", {})
    prev_sig_art: dict[str, str] = prev.get("sig_artifact", {})
    prev_class: dict[str, str] = prev.get("last_class", {})
    migrating = "oracle_sig" not in prev
    prev_artifacts = set(prev.get("source_artifacts", []))

    seen: set[str] = set()
    rounds: list[str] = []
    last_status: dict[str, bool] = {}  # name -> bad? (latest artifact wins)
    last_row: dict[str, object] = {}
    last_art: dict[str, str] = {}  # name -> newest artifact containing it
    for base, data in artifacts:
        if not isinstance(data, dict):
            continue
        seen.update(data.keys())
        rounds.append(base)
        for name, row in data.items():
            last_status[name] = _row_is_bad(row)
            last_row[name] = row
            last_art[name] = base

    oracle_sig: dict[str, str] = {}
    sig_artifact: dict[str, str] = {}
    last_class: dict[str, str] = {}
    for name in sorted(seen):
        cls = _row_class(last_row.get(name))
        if cls is None:  # crashed last row: carry forward, else live
            cls = prev_class.get(
                name, "oracled" if name in live_sig else "rows_only"
            )
        last_class[name] = cls
        if prev_sig_art.get(name) == last_art[name] and name in prev_sig:
            # No new sample since the signature was taken: carry it so
            # later oracle edits stay visible as live-vs-snapshot skew.
            oracle_sig[name] = prev_sig[name]
            sig_artifact[name] = prev_sig_art[name]
        elif name in live_sig:
            oracle_sig[name] = live_sig[name]
            sig_artifact[name] = last_art[name]

    if migrating:
        stale_seed = [n for n in bootstrap_stale if n in seen]
    else:
        new_artifacts = set(rounds) - prev_artifacts
        stale_seed = [
            n
            for n in prev.get("stale_seed", [])
            if last_art.get(n) not in new_artifacts
        ]

    return {
        "rounds": len(rounds),
        "source_artifacts": rounds,
        "seen": sorted(seen),
        "last_bad": sorted(n for n, bad in last_status.items() if bad),
        "last_class": last_class,
        "oracle_sig": oracle_sig,
        "sig_artifact": sig_artifact,
        "stale_seed": stale_seed,
    }


def main() -> None:
    from mapreduce_lab_spark import registry

    live_sig = registry.oracle_signatures()

    dest = os.path.join(ROOT, "mapreduce_lab_spark", "driver_seen.json")
    try:
        with open(dest) as f:
            prev = json.load(f)
        if not isinstance(prev, dict):
            prev = {}
    except (OSError, ValueError):
        prev = {}

    artifacts: list[tuple[str, dict]] = []
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                artifacts.append((os.path.basename(path), json.load(f)))
        except (OSError, ValueError):
            continue

    out = build_snapshot(artifacts, prev, live_sig)
    with open(dest, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"wrote {dest}: {len(out['seen'])} seen queries over "
        f"{out['rounds']} rounds; last_bad={out['last_bad']} "
        f"stale_seed={out['stale_seed']}"
    )


if __name__ == "__main__":
    main()
