#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Registers each parquet table as a DuckDB view, runs every oracle SQL in
<verifyOutDir>/oracle_sql.json, and compares against the Spark result in
<verifyOutDir>/<name>/ (column names sorted, rows sorted, exact values).
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows):
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                rr.append(("f", repr(v)))          # exact double repr
            elif v is None:
                rr.append(("n", ""))
            else:
                rr.append(("o", str(v)))
        out.append(tuple(rr))
    out.sort()
    return out

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output")
            n_bad += 1
            continue
        # con.sql(...) relations, NOT con.execute(...): execute returns the
        # connection itself (so two "results" would alias each other and a
        # late .description read reflects the LAST query), and DB-API type
        # codes are coarse categories (BIGINT and HUGEINT both say NUMBER).
        # Relation .types carry real DuckDB types, captured per relation.
        mine_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        mine_cols = list(mine_rel.columns)
        mine_type_list = [str(t) for t in mine_rel.types]
        mine_rows = mine_rel.fetchall()
        try:
            ref_rel = con.sql(oracle[name])
            ref_cols = list(ref_rel.columns)
            ref_type_list = [str(t) for t in ref_rel.types]
            ref_rows = ref_rel.fetchall()
        except Exception as e:
            print(f"ORA-ERR  {name}: {e}")
            n_bad += 1
            continue
        # the driver's compare sorts a pandas dataframe of the output —
        # ARRAY/LIST/STRUCT cells make that crash (unhashable ndarray),
        # which this mirror's str(v) canon would silently survive. Reject
        # nested output columns up front (stringify them in the query —
        # the q20 concat_ws / array_to_string convention).
        nested = [(c, t) for c, t in
                  list(zip(mine_cols, mine_type_list)) + list(zip(ref_cols, ref_type_list))
                  if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST"))]
        if nested:
            print(f"NESTED   {name}: array/struct output columns would crash "
                  f"the driver's pandas sort: {sorted(set(nested))}")
            n_bad += 1
            continue
        if sorted(mine_cols) != sorted(ref_cols):
            print(f"SCHEMA   {name}: spark={sorted(mine_cols)} duck={sorted(ref_cols)}")
            n_bad += 1
            continue
        # driver's hash compare is TYPED (Arrow-level): a value-equal column
        # with a different dtype (e.g. DuckDB window SUM(BIGINT) -> HUGEINT,
        # Arrow decimal128) fails even though values match. Plain integer
        # WIDTHS however are tolerated by the driver (row_number int32 vs
        # ROW_NUMBER BIGINT has hash-matched for rounds), so normalize the
        # int family but keep HUGEINT/DECIMAL distinct — that is the class
        # that actually burned round 5.
        def norm(t):
            return "INT" if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT") else t
        mine_types = {c: norm(t) for c, t in zip(mine_cols, mine_type_list)}
        ref_types = {c: norm(t) for c, t in zip(ref_cols, ref_type_list)}
        dt_diff = [(c, mine_types[c], ref_types[c]) for c in sorted(mine_cols)
                   if mine_types[c] != ref_types[c]]
        if dt_diff:
            print(f"DTYPE    {name}: " + "; ".join(
                f"{c}: spark={a} duck={b}" for c, a, b in dt_diff))
            n_bad += 1
            continue
        # reorder both to sorted column order
        m_idx = [mine_cols.index(c) for c in sorted(mine_cols)]
        r_idx = [ref_cols.index(c) for c in sorted(ref_cols)]
        m = canon([[r[i] for i in m_idx] for r in mine_rows])
        r = canon([[r[i] for i in r_idx] for r in ref_rows])
        if len(m) != len(r):
            print(f"ROWS     {name}: spark={len(m)} duck={len(r)}")
            n_bad += 1
        elif m != r:
            diffs = [i for i, (a, b) in enumerate(zip(m, r)) if a != b]
            print(f"VALUES   {name}: {len(diffs)}/{len(m)} rows differ; first: ")
            i = diffs[0]
            print(f"  spark: {m[i]}")
            print(f"  duck : {r[i]}")
            n_bad += 1
        else:
            print(f"OK       {name} ({len(m)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {len(oracle)} total oracled")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
