#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query parquet in <verifyOutDir>, runs the matching oracle SQL from
oracle_sql.json in DuckDB against the <sfDir> tables and compares:
row count, column names, and a hash of the column-name-sorted,
row-sorted values (the same normalization the driver describes).
"""
import sys, os, json, glob
import duckdb

# Per-query records in the driver's CORRECTNESS_rN.json format, filled by
# main() and written out when a --json <path> argument is given — so a
# round whose driver-side compare glitches (r14 shipped a literal `{}`)
# still carries a self-computed correctness artifact in the exact shape
# downstream tooling expects.
records = {}

def record(q, rows_match, schema_match, hash_match, spark_rows,
           oracle_rows, err):
    records[q] = {
        "rows_match": rows_match, "schema_match": schema_match,
        "hash_match": hash_match, "spark_rows": spark_rows,
        "oracle_rows": oracle_rows, "err": err,
    }

def norm(rel):
    # compare DECIMAL columns as their exact digit strings: fetchdf
    # coerces DECIMAL to float64, which silently rounds 38-digit sums
    # to ~53-bit precision on BOTH sides and would pass drifted values
    types = [str(t) for t in rel.types]
    if any(t.startswith("DECIMAL") for t in types):
        rel = rel.project(", ".join(
            f'"{c}"::VARCHAR AS "{c}"' if t.startswith("DECIMAL") else f'"{c}"'
            for c, t in zip(rel.columns, types)))
    df = rel.fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize values: floats to repr, others to str
    rows = []
    for t in df.itertuples(index=False):
        rows.append(tuple(repr(v) for v in t))
    rows.sort()
    return list(df.columns), rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for name in ["region","nation","customer","supplier","part","orders",
                 "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{name}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    # queries whose dump FAILED are reported by Verify in errors.json —
    # surface them as failures instead of silently shrinking the set
    errs_path = f"{out_dir}/errors.json"
    if os.path.exists(errs_path):
        for q, msg in json.load(open(errs_path)).items():
            results[q] = f"EXEC_ERROR: {msg[:200]}"
            record(q, False, False, False, None, None,
                   f"spark exec error: {msg[:200]}")
    qdirs = sorted(d for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d))
    for qd in qdirs:
        q = os.path.basename(qd)
        if q in results:
            # the dump dir is STALE (this run failed before overwriting
            # it) — comparing it would mask the failure errors.json exists
            # to surface
            continue
        got_rel = con.sql(f"SELECT * FROM read_parquet('{qd}/*.parquet')")
        got_cols, got_rows = norm(got_rel)
        if q not in oracle:
            results[q] = f"ROWS_ONLY rows={len(got_rows)}" + (" EMPTY!" if not got_rows else "")
            # rows_match is UNKNOWN here (there is no oracle row count to
            # match against) — None, not a non-empty verdict, keeps the
            # field's semantics identical to the driver's per-query format
            record(q, None, None, None, len(got_rows), None,
                   "rows_only (no oracle SQL)")
            continue
        try:
            exp_cols, exp_rows = norm(con.sql(oracle[q]))
        except Exception as e:
            results[q] = f"ORACLE_SQL_ERROR: {e}"
            record(q, False, False, False, len(got_rows), None,
                   f"oracle sql error: {str(e)[:200]}")
            continue
        record(q, len(got_rows) == len(exp_rows), got_cols == exp_cols,
               got_rows == exp_rows, len(got_rows), len(exp_rows), None)
        if got_cols != exp_cols:
            results[q] = f"SCHEMA_MISMATCH got={got_cols} exp={exp_cols}"
        elif len(got_rows) != len(exp_rows):
            results[q] = f"ROWCOUNT got={len(got_rows)} exp={len(exp_rows)}"
        elif got_rows != exp_rows:
            bad = sum(1 for a, b in zip(got_rows, exp_rows) if a != b)
            i = next(i for i, (a, b) in enumerate(zip(got_rows, exp_rows)) if a != b)
            results[q] = (f"VALUE_MISMATCH {bad}/{len(got_rows)} rows differ; "
                          f"first@{i}: got={got_rows[i]} exp={exp_rows[i]}")
        else:
            results[q] = f"OK rows={len(got_rows)}"
    width = max(len(q) for q in results)
    fails = 0
    for q in sorted(results):
        print(f"{q:<{width}}  {results[q]}")
        if not results[q].startswith(("OK", "ROWS_ONLY")):
            fails += 1
    print(f"\n{len(results) - fails}/{len(results)} pass")
    return 1 if fails else 0

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    json_out = None
    if "--json" in sys.argv:
        i = sys.argv.index("--json")
        if i + 1 >= len(sys.argv) or sys.argv[i + 1].startswith("--"):
            sys.exit("usage: oracle_check.py <sfDir> <verifyOutDir> "
                     "[--json <outPath>]")
        json_out = sys.argv[i + 1]
        if json_out in args:
            args.remove(json_out)
    if len(args) != 2:
        sys.exit("usage: oracle_check.py <sfDir> <verifyOutDir> "
                 "[--json <outPath>]")
    rc = main(args[0], args[1])
    if json_out:
        with open(json_out, "w") as f:
            json.dump(records, f, indent=2)
        print(f"wrote {json_out} ({len(records)} queries)")
    sys.exit(rc)
