#!/usr/bin/env python3
"""Oracle TYPE audit — structurally kills the q130 class of red row.

DuckDB widens some aggregates beyond what Spark (and the driver's
exact-hash serializer) can represent: `sum(BIGINT)` returns HUGEINT
(int128), unsigned casts return UBIGINT, etc. Values can be
integer-identical yet fail the driver's exact hash purely on
serialization width. This audit runs every oracle SQL from a
graft.Verify dump with LIMIT 0 and fails if any OUTPUT column has a
type outside the engine-representable set.

Usage: audit_oracle_types.py <sfDir> <verifyOutDir>
Exit 0 = all oracles clean; exit 1 = offenders listed.
"""
import sys, json, re
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

# Types Spark can emit and the driver hashes identically.
OK = re.compile(
    r"^(BOOLEAN|TINYINT|SMALLINT|INTEGER|BIGINT|FLOAT|DOUBLE|"
    r"DECIMAL\(\d+,\d+\)|VARCHAR|BLOB|DATE|TIMESTAMP(?: WITH TIME ZONE)?|"
    r"(BOOLEAN|TINYINT|SMALLINT|INTEGER|BIGINT|FLOAT|DOUBLE|VARCHAR)\[\])$")

bad = []
for name, sql in sorted(oracle.items()):
    try:
        rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
    except Exception as e:
        bad.append((name, f"oracle SQL error: {e}"))
        continue
    for col, typ in zip(rel.columns, map(str, rel.types)):
        if not OK.match(typ):
            bad.append((name, f"column `{col}` has non-engine type {typ}"))

if bad:
    print(f"TYPE-AUDIT FAIL {len(bad)}:")
    for n, d in bad:
        print(f"  {n}: {d}")
    sys.exit(1)
print(f"TYPE-AUDIT PASS: {len(oracle)} oracles, all output types engine-representable")
