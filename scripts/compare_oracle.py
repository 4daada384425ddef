#!/usr/bin/env python3
"""Local replica of the driver oracle compare: run graft.Verify to an
output dir, then: python3 scripts/compare_oracle.py <sfDir> <verifyOutDir>."""
import duckdb, json, sys, glob, os

sfdir, vqdir = sys.argv[1], sys.argv[2]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{vqdir}/oracle_sql.json"))
fail = 0
for name in sorted(os.listdir(vqdir)):
    d = os.path.join(vqdir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    sp = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    if name not in oracle:
        print(f"{name:22s} rows-only  spark_rows={len(sp)}")
        continue
    try:
        od = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name:22s} ORACLE ERR {e}")
        fail += 1
        continue
    sp2 = sp[sorted(sp.columns)]
    od2 = od[sorted(od.columns)]
    ok_schema = list(sp2.columns) == list(od2.columns)
    ok_rows = len(sp2) == len(od2)
    ok_hash = False
    if ok_schema and ok_rows:
        a = sp2.sort_values(by=list(sp2.columns)).reset_index(drop=True)
        b = od2.sort_values(by=list(od2.columns)).reset_index(drop=True)
        # Driver semantics are dtype-strict: a DuckDB HUGEINT sum that
        # pandas materializes as float64 must NOT silently match Spark's
        # int64 — the oracle SQL has to CAST to the engine's type.
        if list(map(str, a.dtypes)) != list(map(str, b.dtypes)):
            print(f"    dtype diff: spark={list(map(str, a.dtypes))} "
                  f"oracle={list(map(str, b.dtypes))}")
            ok_hash = False
        else:
            try:
                ok_hash = a.equals(b)
            except Exception:
                ok_hash = False
        if not ok_hash:
            # show first diff
            for i in range(len(a)):
                ra, rb = a.iloc[i].tolist(), b.iloc[i].tolist()
                if ra != rb:
                    print(f"    first diff row {i}: spark={ra} oracle={rb}")
                    break
    status = "OK" if (ok_schema and ok_rows and ok_hash) else \
        f"MISMATCH schema={ok_schema} rows={ok_rows}({len(sp2)}/{len(od2)}) hash={ok_hash}"
    if "OK" != status:
        fail += 1
    print(f"{name:22s} {status}")
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
