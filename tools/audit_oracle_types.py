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


def unbanded_sums(sql):
    """Occurrences of sum(/avg( whose argument does not start with CAST(.

    Raw `sum(DOUBLE)` depends on accumulation order (round-10 q156: a
    2-3 ULP divergence on a repartitioned lake write), so every sum
    feeding a DOUBLE output must band its addends:
    `sum(CAST(x AS DECIMAL(p,s)))`. This scanner extracts each sum's
    inner expression by paren matching and reports the unbanded ones;
    the caller flags the query only if its OUTPUT carries a DOUBLE
    column (integer sums widen to HUGEINT and are caught — and must be
    cast OUTSIDE — by the type check above, so they are exempted via
    ALLOW below, not by banding).
    """
    out = []
    low = sql.lower()
    i = 0
    while True:
        m = re.search(r"\b(sum|avg)\s*\(", low[i:])
        if not m:
            return out
        fn = m.group(1)
        start = i + m.end()          # index just past the open paren
        depth, j = 1, start
        while j < len(sql) and depth:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        inner = sql[start:j - 1].strip()
        if not re.match(r"(?i)^cast\s*\(", inner):
            out.append(f"{fn}({inner})")
        i = j

# Reviewed-safe unbanded sums/avgs, keyed by query name -> set of
# `fn(inner)` strings. Legitimate reasons (each entry is one of):
#   int:    INTEGER-typed addends — exact at any order (the HUGEINT
#           check above forces their OUTER cast, which this textual
#           scan can't pair with the aggregate)
#   dec:    DECIMAL-typed addends (banded upstream) — exact
#   window: running sum OVER (ORDER BY ...) — the frame pins the
#           accumulation order identically in both engines
ALLOW_EXACT = {
    # window-ordered running sum: the ROWS frame pins accumulation
    # order (left-associative ascending) identically in both engines
    "q06_window_running": {"sum(o_totalprice)"},
    # l_quantity is integer-valued (1..50 stored as double): integer
    # addends sum exactly at any order up to 2^53
    "q57_correlated_subquery": {"sum(l_quantity)", "avg(total_qty)"},
    "q102_top_customer_orders": {"sum(l_quantity)"},
    "q106_bucketed_local_agg": {"sum(l_quantity)"},
    "q109_small_quantity_lines": {"avg(l2.l_quantity)"},
    # integer-typed addends (counts, 0/1 flags, lengths, date diffs)
    "q21_string_funcs": {"avg(length(p_name))"},
    "q22_conditional_agg": {"sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)"},
    "q25_fuzzy_levenshtein": {"avg(dist)"},
    "q28_datetime_funcs": {
        "avg(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01'))"},
    "q36_token_count": {"sum(n_tokens)", "avg(n_tokens)"},
    "q47_sessionize": {"sum(new_sess)"},
    "q74_stream_sessions": {"sum(new_sess)"},
    "q63_repetition_signals": {"sum(c)"},
    "q143_bigram_logprob": {"sum(c)"},
    "q125_bm25_retrieval": {"avg(dl)"},
    # q129: ct/cr are counts (int), the CASE sums are 0/1 flags, and
    # lr is DECIMAL(18,9)-banded upstream — all exact at any order
    "q129_dsir_selection": {
        "sum(CASE WHEN t THEN 1 ELSE 0 END)",
        "sum(CASE WHEN NOT t THEN 1 ELSE 0 END)",
        "sum(ct)", "sum(cr)", "sum(l.lr)"},
}

bad = []
for name, sql in sorted(oracle.items()):
    try:
        rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
    except Exception as e:
        bad.append((name, f"oracle SQL error: {e}"))
        continue
    types = list(zip(rel.columns, map(str, rel.types)))
    for col, typ in types:
        if not OK.match(typ):
            bad.append((name, f"column `{col}` has non-engine type {typ}"))
    if any(t in ("DOUBLE", "FLOAT") for _, t in types):
        allowed = ALLOW_EXACT.get(name, set())
        for occ in unbanded_sums(sql):
            if occ not in allowed:
                bad.append((name,
                    f"raw float-agg risk: {occ} is unbanded and the "
                    f"query outputs DOUBLE — band as fn(CAST(.. AS "
                    f"DECIMAL(p,s))) or ALLOW_EXACT if int/decimal/"
                    f"window-ordered"))

if bad:
    print(f"TYPE-AUDIT FAIL {len(bad)}:")
    for n, d in bad:
        print(f"  {n}: {d}")
    sys.exit(1)
print(f"TYPE-AUDIT PASS: {len(oracle)} oracles, all output types engine-representable")
