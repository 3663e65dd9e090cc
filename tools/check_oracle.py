#!/usr/bin/env python3
"""Local emulation of the driver's t2 DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query result parquet under <verifyOutDir>/<name>/, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB with every base
table registered as a view over <sfDir>/<table>.parquet, then compares:
column names (sorted), row counts, and values (rows sorted, floats
rounded to 9 significant-ish decimals).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _norm_expr(col: str, typ: str) -> str:
    """DuckDB expression mirroring norm()'s per-column normalization."""
    q = f'"{col}"'
    t = typ.upper()
    if t in ("FLOAT", "DOUBLE", "REAL") or t.startswith("DECIMAL"):
        # DECIMAL joins the float branch: integer*decimal-literal
        # arithmetic yields DECIMAL in the oracle but DOUBLE in the
        # Spark-written parquet; normalizing each side by its own type
        # would render "1.50" vs "1.5" and false-FAIL the hash compare
        e = f"round({q}::DOUBLE, 6)::VARCHAR"
    elif t.startswith("TIMESTAMP"):
        # one canonical category for every timestamp flavor: TZ flavors
        # convert through UTC (connection TimeZone is pinned to UTC in
        # main) so TIMESTAMPTZ vs TIMESTAMP renders identically
        e = f"({q}::TIMESTAMP)::VARCHAR"
    elif t in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "HUGEINT",
               "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"):
        e = f"({q}::BIGINT)::VARCHAR"
    else:
        e = f"{q}::VARCHAR"
    return f"COALESCE({e}, chr(0) || 'NULL')"


def big_compare(con, res_files, sql):
    """Order-independent multiset compare fully inside DuckDB: both sides
    normalized identically, then count + sum-of-row-hashes (HUGEINT sum,
    no overflow)."""
    con.execute("CREATE OR REPLACE TEMP VIEW _exp AS " + sql)
    cols_exp = con.execute("DESCRIBE _exp").fetchall()
    files = ", ".join("'" + f.replace("'", "''") + "'" for f in res_files)
    con.execute(
        f"CREATE OR REPLACE TEMP VIEW _got AS SELECT * FROM read_parquet([{files}])")
    cols_got = con.execute("DESCRIBE _got").fetchall()
    names_exp = sorted(c[0] for c in cols_exp)
    names_got = sorted(c[0] for c in cols_got)
    if names_exp != names_got:
        return False, f"columns {names_got} != {names_exp}"

    def digest(view, cols):
        types = {c[0]: c[1] for c in cols}
        parts = ", ".join(_norm_expr(c, types[c]) for c in sorted(types))
        row = f"hash(concat_ws(chr(31), {parts}))"
        return con.execute(
            f"SELECT count(*), sum({row}::HUGEINT) FROM {view}").fetchone()

    n_g, h_g = digest("_got", cols_got)
    n_e, h_e = digest("_exp", cols_exp)
    if n_g != n_e:
        return False, f"rows {n_g} != {n_e}"
    if h_g != h_e:
        return False, f"row multiset hash mismatch over {n_g} rows"
    return True, ""


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    # pin the session timezone so TIMESTAMPTZ -> TIMESTAMP conversion in
    # _norm_expr is a UTC conversion regardless of the host TZ
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # multi-file layout (GenTestData at sf>=50 writes a directory
            # of parts): glob instead of single-file read
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # subset mode (Verify ran with an entry filter): only judge the
    # entries Verify was asked to produce
    ran = json.load(open(f"{out_dir}/_verify_ran.json")) \
        if os.path.exists(f"{out_dir}/_verify_ran.json") else None
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if ran is not None and name not in ran:
            continue
        res_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not res_files:
            print(f"FAIL {name}: no result parquet")
            n_fail += 1
            continue
        try:
            # Past a few million rows the pandas sort/compare dominates the
            # gate's wall clock (sf100 write entries return 100M keys), so
            # big results compare inside DuckDB: identical per-column
            # normalization (float round-6, everything stringly), then an
            # order-independent multiset hash-sum over the rows.
            n_got = con.execute(
                "SELECT count(*) FROM read_parquet(?)", [res_files]).fetchone()[0]
            if n_got > int(os.environ.get("ORACLE_BIG_ROWS", "2000000")):
                ok, msg = big_compare(con, res_files, sql)
                if ok:
                    print(f"PASS {name} ({n_got} rows, hash-sum path)")
                    n_pass += 1
                else:
                    print(f"FAIL {name}: {msg}")
                    n_fail += 1
                continue
            got = norm(pd.concat([pd.read_parquet(f) for f in res_files]))
            exp = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
        elif not got.equals(exp):
            neq = (got != exp) & ~(got.isna() & exp.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {bad.sum()} differing rows; first:")
            print(pd.concat([got[bad].head(3).add_suffix("_got"),
                             exp[bad].head(3).add_suffix("_exp")], axis=1))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
