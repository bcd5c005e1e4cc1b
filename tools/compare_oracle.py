#!/usr/bin/env python3
"""Dev harness mimicking the driver's DuckDB-oracle compare.

Usage: compare_oracle.py <sfDir> <verifyOutDir>
Loads each <query>.parquet produced by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sfDir tables,
canonicalizes both (columns sorted by name, rows sorted, floats rounded)
and reports match/mismatch per query.
"""
import sys, json, glob, math, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(rows, cols):
    """Column-name-sorted rows; floats kept raw but sorted by a rounded
    key so ordering is stable across engines."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    def key(row):
        return tuple(f"{v:.5g}" if isinstance(v, float) and not math.isnan(v)
                     else repr(v) for v in row)
    return sorted(out, key=key)

def rows_equal(a, b):
    if len(a) != len(b): return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb): return False
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if math.isnan(va) and math.isnan(vb): continue
                if not math.isclose(va, vb, rel_tol=1e-6, abs_tol=1e-9):
                    return False
            elif va != vb:
                return False
    return True

fails, passes, noracle = [], [], []
for qdir in sorted(glob.glob(f"{out_dir}/q*")):
    name = os.path.basename(qdir)
    got_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
    got = canon(got_rel.fetchall(), got_rel.columns)
    if name not in oracle:
        noracle.append((name, len(got)))
        continue
    try:
        exp_rel = con.sql(oracle[name])
        exp = canon(exp_rel.fetchall(), exp_rel.columns)
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    if sorted(got_rel.columns) != sorted(exp_rel.columns):
        fails.append((name, f"cols {sorted(got_rel.columns)} != {sorted(exp_rel.columns)}"))
    elif rows_equal(got, exp):
        passes.append(name)
    else:
        diff = [f"rows {len(got)} vs {len(exp)}"]
        sg, se = set(map(repr, got)), set(map(repr, exp))
        onlyg = [r for r in got if repr(r) not in se][:3]
        onlye = [r for r in exp if repr(r) not in sg][:3]
        if onlyg: diff.append(f"ours-only: {onlyg}")
        if onlye: diff.append(f"oracle-only: {onlye}")
        fails.append((name, "; ".join(diff)))

print(f"PASS {len(passes)}: {' '.join(passes)}")
print(f"NO-ORACLE {len(noracle)}: {[(n, c) for n, c in noracle]}")
print(f"FAIL {len(fails)}:")
for n, d in fails:
    print(f"  {n}: {d[:600]}")
