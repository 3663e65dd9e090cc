#!/usr/bin/env python3
"""Post-check: walk the w44/w45 exported Iceberg trees with the
independent pure-Python walker (tools/iceberg_walk.py — a third
implementation sharing nothing with the JVM export/import paths) and
hash-compare the recovered live rows against the engine's Verify output.

Usage: python3 tools/check_iceberg_walk.py <verifyOutDir> [stageDir]

Run after `runMain graft.Verify ...` produced <verifyOutDir> (the w44/w45
entries stage their tree locations under the oracle stage root).
"""
import sys, os, json, glob, subprocess

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
from check_oracle import _norm_expr  # noqa: E402

# per-entry SQL over the walker's `live` view, mirroring the entry's own
# projection of the imported table
ENTRIES = {
    "w44_iceberg_roundtrip":
        "SELECT o_orderkey, o_totalprice, "
        "coalesce(o_flag, 'even') AS o_flag FROM live",
    "w45_iceberg_mor_roundtrip":
        "SELECT o_orderkey, o_totalprice FROM live",
}


def engine_digest(con, res_files):
    files = ", ".join("'" + f.replace("'", "''") + "'" for f in res_files)
    con.execute("CREATE OR REPLACE TEMP VIEW _got AS "
                f"SELECT * FROM read_parquet([{files}])")
    cols = con.execute("DESCRIBE _got").fetchall()
    types = {c[0]: c[1] for c in cols}
    parts = ", ".join(_norm_expr(c, types[c]) for c in sorted(types))
    n, h = con.execute(
        f"SELECT count(*), sum(hash(concat_ws(chr(31), {parts}))::HUGEINT) "
        "FROM _got").fetchone()
    return int(n), str(h), sorted(types)


def main(out_dir, stage_dir="/tmp/graft-oracle-stage"):
    import duckdb
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    n_pass = n_fail = 0
    for name, sql in sorted(ENTRIES.items()):
        tree_file = os.path.join(stage_dir, f"{name}_tree.txt")
        res_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not os.path.exists(tree_file) or not res_files:
            print(f"SKIP {name}: missing tree pointer or verify output")
            continue
        tree = open(tree_file).read().strip()
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(HERE, "iceberg_walk.py"),
                 tree, "--sql", sql],
                capture_output=True, text=True, check=True)
            walked = json.loads(out.stdout.strip().splitlines()[-1])
        except subprocess.CalledProcessError as e:
            print(f"FAIL {name}: walker error: {e.stderr.strip()[-500:]}")
            n_fail += 1
            continue
        n, h, cols = engine_digest(con, res_files)
        if walked["columns"] != cols:
            print(f"FAIL {name}: columns {walked['columns']} != {cols}")
            n_fail += 1
        elif walked["rows"] != n:
            print(f"FAIL {name}: rows {walked['rows']} != {n}")
            n_fail += 1
        elif walked["hash"] != h:
            print(f"FAIL {name}: row multiset hash mismatch over {n} rows")
            n_fail += 1
        else:
            print(f"PASS {name} ({n} rows, independent-walker hash match)")
            n_pass += 1
        # per-snapshot schema probe (w44's tree evolves mid-history):
        # walking the FIRST snapshot must serve the pre-evolution columns
        if name == "w44_iceberg_roundtrip":
            md_file = os.path.join(tree, "metadata", "v" + open(
                os.path.join(tree, "metadata", "version-hint.text"))
                .read().strip() + ".metadata.json")
            md = json.load(open(md_file))
            first = min(s["snapshot-id"] for s in md["snapshots"])
            try:
                out = subprocess.run(
                    [sys.executable, os.path.join(HERE, "iceberg_walk.py"),
                     tree, "--snapshot", str(first)],
                    capture_output=True, text=True, check=True)
                past = json.loads(out.stdout.strip().splitlines()[-1])
            except subprocess.CalledProcessError as e:
                print(f"FAIL {name}@snap{first}: {e.stderr.strip()[-300:]}")
                n_fail += 1
                continue
            if "o_flag" in past["columns"]:
                print(f"FAIL {name}@snap{first}: pre-evolution snapshot "
                      f"must NOT serve the evolved column: {past['columns']}")
                n_fail += 1
            elif not (0 < past["rows"] < n):
                print(f"FAIL {name}@snap{first}: implausible time-travel "
                      f"row count {past['rows']} (current {n})")
                n_fail += 1
            else:
                print(f"PASS {name}@snap{first} ({past['rows']} rows, "
                      "pre-evolution schema served)")
                n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1],
                  sys.argv[2] if len(sys.argv) > 2
                  else "/tmp/graft-oracle-stage"))
