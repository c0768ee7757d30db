#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify (already executed by caller or via --run-verify) output
against DuckDB oracles: for each <out>/<name> parquet dir, executes the
matching SQL from oracle_sql.json over views of /root/testdata/<sf>/*.parquet
and compares values with columns sorted by name (like the driver), both
row-ordered and row-sorted.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        pdir = os.path.join(outdir, name)
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = pq.read_table(files[0])
        except Exception as e:
            print(f"FAIL {name}: unreadable spark output: {e}"); n_fail += 1; continue
        try:
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        # sort columns by name (driver behavior)
        got = got.select(sorted(got.column_names))
        want = want.select(sorted(want.column_names))
        if got.column_names != want.column_names:
            print(f"FAIL {name}: columns {got.column_names} vs {want.column_names}"); n_fail += 1; continue
        if got.num_rows != want.num_rows:
            print(f"FAIL {name}: rows {got.num_rows} vs {want.num_rows}"); n_fail += 1; continue
        schema_note = ""
        if got.schema != want.schema:
            schema_note = f" [schema diff: {[(f.name, str(f.type)) for f in got.schema]} vs {[(f.name, str(f.type)) for f in want.schema]}]"
        # value compare, row order as produced
        gp, wp = got.to_pylist(), want.to_pylist()
        mismatches = [(i, a, b) for i, (a, b) in enumerate(zip(gp, wp)) if not roweq(a, b)]
        if mismatches:
            i, a, b = mismatches[0]
            print(f"FAIL {name}: {len(mismatches)} value mismatches; first at row {i}:\n  spark={a}\n  duck ={b}{schema_note}")
            n_fail += 1
            continue
        print(f"PASS {name} ({got.num_rows} rows){schema_note}")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

def roweq(a, b):
    for k in a:
        va, vb = a[k], b[k]
        if isinstance(va, float) and isinstance(vb, float):
            if va != vb and not (va != va and vb != vb):
                return False
        elif va != vb:
            return False
    return True

if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    sys.exit(main(out, sf))
