#!/usr/bin/env python3
"""Dev harness mirroring the driver's DuckDB-oracle correctness gate.

NOT part of the shipped Scala library — local pre-validation only.
Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

For each query result parquet written by graft.Verify, runs the
corresponding oracle SQL (oracle_sql.json) in DuckDB against the fixture
tables, then compares: columns sorted by name, rows sorted by all
columns, values compared exactly (floats bit-exact, tiny-ulp fallback
reported separately).
"""
import json, math, sys
import duckdb

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    def key(t):
        return tuple((v is None, str(type(v)), str(v)) for v in t)
    return sorted(out, key=key), [cols[i] for i in idx]

def eq(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    return a == b

def main(sf_dir, out_dir, json_out=None):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    passed, failed, skipped = [], [], []
    report = {}  # per-query record, driver CORRECTNESS_r{N}.json shape
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if name not in oracle:
            skipped.append(name)
            continue
        try:
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            grows, gcols = got.fetchall(), [d[0] for d in got.description]
            want = con.execute(oracle[name])
            wrows, wcols = want.fetchall(), [d[0] for d in want.description]
        except Exception as e:
            failed.append((name, f"EXEC: {e}"))
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": None,
                            "oracle_rows": None, "err": f"EXEC: {e}"}
            continue
        # The driver's hash harness renders DuckDB HUGEINT differently
        # from Spark's BIGINT even when values agree (round-6 lesson:
        # an uncast sum(BIGINT) output column is a guaranteed driver
        # hash-mismatch that this fetchall-based gate would miss).
        try:
            tys = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
            huge = [c for c, t, *_ in tys if "HUGEINT" in t.upper()]
            if huge:
                failed.append((name, f"TYPE: HUGEINT oracle output cols {huge} "
                                     f"(wrap in CAST(... AS BIGINT))"))
                continue
        except Exception:
            pass
        g, gc = canon(grows, gcols)
        w, wc = canon(wrows, wcols)
        rec = {"rows_match": len(g) == len(w), "schema_match": gc == wc,
               "hash_match": False, "spark_rows": len(g),
               "oracle_rows": len(w), "err": None}
        report[name] = rec
        if gc != wc:
            failed.append((name, f"COLS: got {gc} want {wc}"))
            continue
        if len(g) != len(w):
            failed.append((name, f"ROWS: got {len(g)} want {len(w)}"))
            continue
        bad = None
        for i, (gr, wr) in enumerate(zip(g, w)):
            if not all(eq(a, b) for a, b in zip(gr, wr)):
                bad = (i, gr, wr)
                break
        if bad:
            failed.append((name, f"VAL@{bad[0]}: got {bad[1][:6]} want {bad[2][:6]}"))
        else:
            rec["hash_match"] = True
            passed.append(name)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(dict(sorted(report.items())), f, indent=2)
            f.write("\n")
        print(f"wrote {json_out} ({len(report)} queries)")
    print(f"PASS {len(passed)}: {' '.join(passed)}")
    if skipped:
        print(f"SKIP (no oracle) {len(skipped)}: {' '.join(skipped)}")
    if failed:
        print(f"FAIL {len(failed)}:")
        for n, msg in failed:
            print(f"  {n}: {msg}")
        sys.exit(1)

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--json")]
    jout = next((a.split("=", 1)[1] for a in sys.argv[1:]
                 if a.startswith("--json=")), None)
    main(args[0], args[1], jout)
