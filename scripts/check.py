#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: reads Verify output
parquet + oracle_sql.json, runs each oracle in DuckDB against the same
sf dir, sorts columns by name + rows by all columns, and compares
values exactly. Dev tool only — not part of the Spark library."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
retried = {}  # query -> attempt index that finally succeeded (1 or 2)
for name in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path):
        continue
    files = glob.glob(f"{path}/*.parquet")
    if not files:
        results[name] = "NO_OUTPUT"
        continue
    got = con.sql(f"SELECT * FROM '{files[0]}'").df()
    if name not in oracle:
        results[name] = f"ROWS_ONLY rows={len(got)}"
        continue
    # Retry engine-side exceptions twice: DuckDB's parallel perfect-hash
    # group-by sizes its table from statistics-range products and can
    # raise a spurious INT64-overflow on some runs (observed round 11 on
    # p12/s11 at sf0.1: "Overflow in multiplication of INT64
    # (299574710 * 1099511627792)" — neither operand exists in our SQL,
    # and the identical query passes on re-run). A deterministic SQL
    # error still fails after the retries; retries are recorded.
    exp = None
    for attempt in range(3):
        try:
            if attempt == 2:
                # last resort: the flake lives in the PARALLEL
                # perfect-hash aggregate — retry single-threaded
                con.sql("SET threads=1")
            exp = con.sql(oracle[name]).df()
            if attempt:
                print(f"NOTE {name}: oracle succeeded on retry {attempt}")
                retried[name] = attempt  # durably recorded below
            break
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR (attempt {attempt + 1}) {e}"
        finally:
            if attempt == 2:
                con.sql("RESET threads")
    if exp is None:
        continue
    results.pop(name, None)
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        results[name] = f"COLS got={list(got.columns)} exp={list(exp.columns)}"
        continue
    if got.dtypes.to_dict() != exp.dtypes.to_dict():
        results[name] = (f"DTYPES got={got.dtypes.to_dict()} "
                         f"exp={exp.dtypes.to_dict()}")
        # don't continue — still check values after dtype note
    gs = got.sort_values(by=list(got.columns), ignore_index=True)
    es = exp.sort_values(by=list(exp.columns), ignore_index=True)
    if len(gs) != len(es):
        results[name] = f"ROWS got={len(gs)} exp={len(es)}"
        continue
    if gs.equals(es):
        results[name] = results.get(name, "OK") if results.get(name) else "OK"
        if results[name] != "OK":
            results[name] = "VALUES_OK_" + results[name]
    else:
        diff_cols = [c for c in gs.columns if not gs[c].equals(es[c])]
        detail = []
        for c in diff_cols[:3]:
            neq = gs.index[gs[c] != es[c]].tolist()[:3]
            detail.append(f"{c}@{neq} got={[gs[c][i] for i in neq[:2]]} exp={[es[c][i] for i in neq[:2]]}")
        results[name] = f"VALUES {diff_cols} {detail}"

ok = sum(1 for v in results.values() if v == "OK" or v.startswith("ROWS_ONLY"))
for k, v in sorted(results.items()):
    mark = "PASS" if (v == "OK" or v.startswith("ROWS_ONLY")) else "FAIL"
    print(f"{mark} {k}: {v}")
print(f"\n{ok}/{len(results)} pass")

# Durable per-round record: CORRECTNESS_r10.json came back {} from the
# driver (a capture failure — the identical gate passed 194/194 when
# re-run), so every local gate run now appends a timestamped row with
# per-query PASS/FAIL + totals to correctness_history.jsonl at the
# repo root. An empty driver capture can no longer zero a round's
# correctness record.
import datetime
repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
row = {
    "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(),
    "sf_dir": sf_dir,
    "pass": ok,
    "total": len(results),
    "failed": sorted(k for k, v in results.items()
                     if not (v == "OK" or v.startswith("ROWS_ONLY"))),
    # keep the detail string for failures so a flaky row can be
    # diagnosed after the fact (round 11: a FAIL's message was lost
    # because only the PASS/FAIL bit was recorded)
    "failed_detail": {k: v[:500] for k, v in sorted(results.items())
                      if not (v == "OK" or v.startswith("ROWS_ONLY"))},
    "queries": {k: ("PASS" if (v == "OK" or v.startswith("ROWS_ONLY"))
                    else "FAIL") for k, v in sorted(results.items())},
    # oracle engine-side flakes that passed on retry (query -> attempt
    # count): a flaky-pass is distinguishable from a clean pass, so
    # DuckDB flake frequency is trackable across rounds (round-11
    # advice — previously only a transient stdout NOTE)
    "retried": retried,
}
with open(os.path.join(repo_root, "correctness_history.jsonl"), "a") as f:
    f.write(json.dumps(row) + "\n")

# Defensive driver-format artifact (round-12 verdict task #5): the
# driver wrote an EMPTY CORRECTNESS_r12.json, so every local gate run
# also writes CORRECTNESS_local_r{N}.json in the driver's exact
# per-query schema. GRAFT_ROUND names the round (defaults to the
# highest existing CORRECTNESS_r*.json number + 1 so the local file
# pairs with the round being built). Pass/fail semantics mirror the
# compare above: a PASS row is rows+schema+values exact, so all three
# driver bits are true; a FAIL row keeps its detail string in err.
def _round_no():
    env = os.environ.get("GRAFT_ROUND")
    if env:
        return int(env)
    import re
    ns = [int(m.group(1)) for f in os.listdir(repo_root)
          if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", f))]
    return (max(ns) + 1) if ns else 0

if len(results) >= 50:  # full-gate runs only; skip per-query dev runs
    driver_fmt = {}
    for k, v in sorted(results.items()):
        # Derive each bit from the failure class explicitly (round-13
        # advice): a VALUES_OK_DTYPES result is a dtype mismatch with
        # equal values (schema_match must be False); a COLS failure
        # never reached the row compare (rows_match is unknown, not
        # True); a ROWS_ONLY query was never hash-verified
        # (hash_match=None + rows_only flag, not a silent True).
        rows_only = v.startswith("ROWS_ONLY")
        no_compare = v.startswith("NO_OUTPUT") or v.startswith("ORACLE_SQL_ERROR")
        schema_bad = v.startswith("COLS") or v.startswith("DTYPES") \
            or v.startswith("VALUES_OK_DTYPES")
        # row compare only runs once columns matched
        rows_compared = not (rows_only or no_compare or v.startswith("COLS"))
        values_exact = v == "OK" or v.startswith("VALUES_OK_")
        passed = v == "OK" or rows_only
        driver_fmt[k] = {
            "rows_match": (None if not rows_compared
                           else not v.startswith("ROWS ")),
            "schema_match": (None if rows_only or no_compare
                             else not schema_bad),
            "hash_match": (None if rows_only or no_compare
                           else values_exact),
            "rows_only": rows_only,
            "err": None if passed else v[:500],
        }
    local_path = os.path.join(repo_root,
                              f"CORRECTNESS_local_r{_round_no()}.json")
    with open(local_path, "w") as f:
        json.dump(driver_fmt, f, indent=1)
    print(f"wrote {local_path}")
