#!/usr/bin/env python3
"""Two-tier correctness harness (committed so every round re-runs it
mechanically instead of as a one-off; VERDICT r5 #6).

Tier 1 — the driver's own gate: Verify + DuckDB compare at sf0.01. Every
registered query must match on rows, schema, and values (hash tier).
Tier 2 — the drift gate: the SAME compare at sf0.1, 10x the gate scale.
A query that is green at sf0.01 but diverges at sf0.1 has scale-dependent
semantics (sampling residues, float accumulation, fixture assumptions) —
exactly the class of bug the hash gate alone cannot see.

Usage (after `sbt "runMain graft.Verify <sfdir> <outdir>"`):

    python3 scripts/crosscheck.py <sfdir> <outdir> <label>

e.g.
    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 target/verify_out"
    python3 scripts/crosscheck.py /root/testdata/sf0.01 target/verify_out sf0.01
    sbt -batch "runMain graft.Verify /root/testdata/sf0.1 target/verify_sf01"
    python3 scripts/crosscheck.py /root/testdata/sf0.1 target/verify_sf01 sf0.1

Writes target/CROSSCHECK_<label>.json in the CORRECTNESS_r{N}.json format
(per-query rows/schema/hash match) and exits nonzero on any mismatch.

This file is driver-side tooling (python3 + duckdb + pandas are the
driver's oracle stack, not part of the Spark library).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def compare(sfdir: str, outdir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle_sql = json.load(open(f"{outdir}/oracle_sql.json"))
    report = {}
    for name in sorted(oracle_sql):
        entry = {"rows_match": False, "schema_match": False,
                 "hash_match": False, "spark_rows": None,
                 "oracle_rows": None, "err": None}
        try:
            oracle = con.execute(oracle_sql[name]).fetchdf()
            got = pd.read_parquet(f"{outdir}/{name}")
            oracle = oracle.reindex(sorted(oracle.columns), axis=1)
            got = got.reindex(sorted(got.columns), axis=1)
            entry["spark_rows"] = len(got)
            entry["oracle_rows"] = len(oracle)
            entry["rows_match"] = len(got) == len(oracle)
            entry["schema_match"] = list(got.columns) == list(oracle.columns)
            gs = got.sort_values(list(got.columns)).reset_index(drop=True)
            os_ = oracle.sort_values(list(oracle.columns)).reset_index(drop=True)
            entry["hash_match"] = bool(gs.equals(os_))
        except Exception as e:  # noqa: BLE001 — recorded per query
            entry["err"] = str(e)[:500]
        report[name] = entry
    return report


def main():
    sfdir, outdir, label = sys.argv[1], sys.argv[2], sys.argv[3]
    # surface Verify's own failure record (gates that crashed write a
    # {_graft_error} marker parquet AND are listed here — r7 contract)
    try:
        status = json.load(open(f"{outdir}/_verify_status.json"))
        if status.get("n_failed"):
            print(f"[crosscheck {label}] VERIFY REPORTED {status['n_failed']} "
                  f"FAILED GATES: {', '.join(status['failed'])}")
    except FileNotFoundError:
        pass
    except (json.JSONDecodeError, KeyError) as e:
        # a truncated/partial status (Verify killed mid-write) must not
        # abort the whole crosscheck before compare() runs
        print(f"[crosscheck {label}] WARNING: malformed _verify_status.json: {e}")
    report = compare(sfdir, outdir)
    path = f"target/CROSSCHECK_{label}.json"
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    bad = [n for n, e in report.items()
           if not (e["rows_match"] and e["schema_match"] and e["hash_match"])]
    green = len(report) - len(bad)
    print(f"[crosscheck {label}] {green}/{len(report)} green -> {path}")
    for n in bad:
        e = report[n]
        print(f"  MISMATCH {n}: rows {e['spark_rows']} vs {e['oracle_rows']}"
              f" schema={e['schema_match']} hash={e['hash_match']}"
              f" err={e['err']}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
