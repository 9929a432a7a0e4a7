"""Emit MIRROR_r{N}.json — the full-registry t2 mirror in the exact
CORRECTNESS_r{N}.json schema (rows/schema/hash per query), so the
queries outside the driver's alphabetical first-50 window have a
checked-in, machine-diffable evidence artifact each round.

Run on the FROZEN tree at round end:

    python tools/run_mirror.py --out MIRROR_r6.json

Per query the entry mirrors the driver's record:
  rows_match / schema_match / hash_match : bool (null when no oracle)
  spark_rows / oracle_rows               : int  (oracle null if none)
  err : null | "no_oracle" | "<exception>"
hash_match here means the conftest comparator (row count + lowercased
column set + order-insensitive cell-exact comparison) passed — the
same predicate the judge's own mirror ran in rounds 4-5."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None, help="output JSON path")
    ap.add_argument(
        "--names", default=None, help="comma-separated subset (debug)"
    )
    args = ap.parse_args()

    from glonassdatamining_spark import registry
    from glonassdatamining_spark.session import get_spark
    from tests.conftest import compare_frames, oracle_con

    spark = get_spark("gdm-mirror")
    names = (
        args.names.split(",") if args.names else sorted(registry.all_queries())
    )
    out: dict[str, dict] = {}
    t0 = time.time()
    n_hash = n_rows_only = n_fail = 0
    for i, name in enumerate(names, 1):
        d = registry.get(name)
        entry = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = d.builder(spark, args.sf_dir).toPandas()
            entry["spark_rows"] = int(len(sdf))
            if d.oracle is None:
                entry["err"] = "no_oracle"
                if len(sdf) < 1:
                    entry["err"] = "no_oracle_and_empty"  # vacuous — flag
                    n_fail += 1
                else:
                    n_rows_only += 1
            else:
                con = oracle_con(args.sf_dir)
                odf = con.execute(d.oracle).fetchdf()
                con.close()
                entry["oracle_rows"] = int(len(odf))
                entry["rows_match"] = len(sdf) == len(odf)
                entry["schema_match"] = sorted(
                    c.lower() for c in sdf.columns
                ) == sorted(c.lower() for c in odf.columns)
                try:
                    compare_frames(sdf, odf, name)
                    entry["hash_match"] = True
                    if len(sdf) == 0:
                        # round-10 verdict ask #5: an empty-vs-empty
                        # hash pass is VACUOUS at mirror scales (the
                        # e23 class) — no t2 row may be empty here
                        entry["err"] = "vacuous_empty_vs_empty"
                        n_fail += 1
                    else:
                        n_hash += 1
                except AssertionError as exc:
                    entry["hash_match"] = False
                    entry["err"] = str(exc)[:500]
                    n_fail += 1
        except Exception as exc:  # noqa: BLE001 — record, keep going
            entry["err"] = f"{type(exc).__name__}: {exc}"[:500]
            n_fail += 1
        out[name] = entry
        print(
            f"[{i}/{len(names)}] {name}: "
            f"{'PASS' if entry['hash_match'] else entry['err'] or 'FAIL'}",
            flush=True,
        )

    path = args.out or os.path.join(REPO, "MIRROR.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=0, sort_keys=True)
    print(
        f"mirror: {len(names)} queries, {n_hash} hash-pass, "
        f"{n_rows_only} rows-only clean, {n_fail} failures "
        f"in {time.time() - t0:.0f}s -> {path}"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
