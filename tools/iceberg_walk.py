#!/usr/bin/env python3
"""Independent Apache Iceberg v2 tree walker — a THIRD implementation.

Walks an Iceberg table tree (metadata.json -> manifest list -> manifests
-> data/delete files) using ONLY the public v2 spec: a hand-rolled Avro
container decoder (stdlib) plus DuckDB for the referenced parquet. It
shares no code or assumptions with graft's exporter or importer, so a
bug both JVM paths agree on (same-author blind spot) surfaces here.

Usage:
  python3 tools/iceberg_walk.py <table-dir-or-metadata.json>
      [--snapshot ID] [--sql "SELECT ... FROM live"]

Resolves the current snapshot (or --snapshot), recovers the LIVE rows —
applying equality deletes under the spec's strict `data_seq < delete_seq`
rule and positional deletes by (file_path, pos) — exposes them as the
DuckDB view `live`, runs --sql (default `SELECT * FROM live`), and prints
one JSON line: {"snapshot": id, "rows": n, "hash": h} where `hash` is the
order-independent row-multiset digest (same normalization as
check_oracle.py's big_compare). tools/check_iceberg_walk.py compares it
against the engine's Verify output for w44/w45.
"""
import sys, os, json, struct, zlib, io

# ---------------- Avro container decoding (spec: Object Container Files)

def _read_long(b: io.BytesIO) -> int:
    """zigzag varint"""
    shift, acc = 0, 0
    while True:
        byte = b.read(1)
        if not byte:
            raise EOFError("varint")
        v = byte[0]
        acc |= (v & 0x7F) << shift
        if not (v & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _read_bytes(b: io.BytesIO) -> bytes:
    n = _read_long(b)
    return b.read(n)


def _decode(schema, b: io.BytesIO, names):
    """Decode one value of `schema` (parsed Avro JSON) from `b`.
    `names` maps named-type name -> definition (records/fixed/enums)."""
    if isinstance(schema, str):
        if schema in names:
            return _decode(names[schema], b, names)
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return b.read(1) != b"\x00"
        if t in ("int", "long"):
            return _read_long(b)
        if t == "float":
            return struct.unpack("<f", b.read(4))[0]
        if t == "double":
            return struct.unpack("<d", b.read(8))[0]
        if t == "bytes":
            return _read_bytes(b)
        if t == "string":
            return _read_bytes(b).decode("utf-8")
        raise ValueError(f"unknown type {t}")
    if isinstance(schema, list):  # union: branch index then value
        idx = _read_long(b)
        return _decode(schema[idx], b, names)
    t = schema["type"]
    if t == "record":
        names[schema["name"]] = schema
        out = {}
        for f in schema["fields"]:
            out[f["name"]] = _decode(f["type"], b, names)
        return out
    if t == "array":
        out = []
        while True:
            n = _read_long(b)
            if n == 0:
                break
            if n < 0:  # block with byte size prefix
                _read_long(b)
                n = -n
            for _ in range(n):
                out.append(_decode(schema["items"], b, names))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(b)
            if n == 0:
                break
            if n < 0:
                _read_long(b)
                n = -n
            for _ in range(n):
                k = _read_bytes(b).decode("utf-8")
                out[k] = _decode(schema["values"], b, names)
        return out
    if t == "fixed":
        names[schema["name"]] = schema
        return b.read(schema["size"])
    if t == "enum":
        names[schema["name"]] = schema
        return schema["symbols"][_read_long(b)]
    # logical types ride on the physical type
    return _decode(t, b, names)


def read_avro(path):
    """All records of an Avro container file as a list of dicts."""
    with open(path, "rb") as fh:
        raw = fh.read()
    b = io.BytesIO(raw)
    if b.read(4) != b"Obj\x01":
        raise ValueError(f"not an Avro container: {path}")
    meta = {}
    while True:
        n = _read_long(b)
        if n == 0:
            break
        if n < 0:
            _read_long(b)
            n = -n
        for _ in range(n):
            k = _read_bytes(b).decode("utf-8")
            meta[k] = _read_bytes(b)
    sync = b.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    records = []
    while True:
        head = b.read(1)
        if not head:
            break
        b.seek(-1, 1)
        count = _read_long(b)
        size = _read_long(b)
        payload = b.read(size)
        if codec == "deflate":
            payload = zlib.decompressobj(-15).decompress(payload)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec}")
        pb = io.BytesIO(payload)
        names = {}
        for _ in range(count):
            records.append(_decode(schema, pb, names))
        if b.read(16) != sync:
            raise ValueError(f"sync marker mismatch in {path}")
    return records, meta


# ---------------- Iceberg tree walk

def from_uri(u: str) -> str:
    if u.startswith("file://"):
        u = u[len("file://"):]
    elif u.startswith("file:"):
        u = u[len("file:"):]
    from urllib.parse import unquote
    return unquote(u)


ICE_TO_DUCK = {
    "boolean": "BOOLEAN", "int": "INTEGER", "long": "BIGINT",
    "float": "FLOAT", "double": "DOUBLE", "date": "DATE",
    "time": "TIME", "timestamp": "TIMESTAMP",
    "timestamptz": "TIMESTAMPTZ", "string": "VARCHAR",
    "uuid": "UUID", "binary": "BLOB",
}


def duck_type(ice):
    if isinstance(ice, str):
        if ice.startswith("decimal("):
            return "DECIMAL" + ice[len("decimal"):]
        return ICE_TO_DUCK.get(ice, "VARCHAR")
    return None  # nested — handled by name passthrough only


def resolve_metadata(loc: str) -> str:
    if os.path.isfile(loc):
        return loc
    md_dir = os.path.join(loc, "metadata")
    hint = os.path.join(md_dir, "version-hint.text")
    if os.path.exists(hint):
        v = open(hint).read().strip()
        return os.path.join(md_dir, f"v{v}.metadata.json")
    # spec fallback: newest vN.metadata.json
    cands = sorted(f for f in os.listdir(md_dir)
                   if f.endswith(".metadata.json"))
    if not cands:
        raise FileNotFoundError(f"no metadata.json under {md_dir}")
    return os.path.join(md_dir, cands[-1])


def main(argv):
    loc = argv[1]
    snap_id = None
    sql = "SELECT * FROM live"
    dump = None
    args = argv[2:]
    while args:
        a = args.pop(0)
        if a == "--snapshot":
            snap_id = int(args.pop(0))
        elif a == "--sql":
            sql = args.pop(0)
        elif a == "--dump":
            dump = args.pop(0)
        else:
            raise SystemExit(f"unknown arg {a}")

    md = json.load(open(resolve_metadata(loc)))
    assert md.get("format-version") == 2, "walker targets format v2"
    if snap_id is None:
        snap_id = md["current-snapshot-id"]
    snap = next(s for s in md["snapshots"] if s["snapshot-id"] == snap_id)
    schema_id = snap.get("schema-id", md.get("current-schema-id", 0))
    schema = next(s for s in md.get("schemas", [])
                  if s.get("schema-id") == schema_id)
    top_fields = [(f["name"], f["type"]) for f in schema["fields"]]

    # manifest list -> manifests (content 0 = data, 1 = deletes)
    mlist, _ = read_avro(from_uri(snap["manifest-list"]))
    data_files = []   # (path, data_seq)
    eq_deletes = []   # (path, delete_seq, equality_ids)
    pos_deletes = []  # (path,)
    for me in mlist:
        manifest, _meta = read_avro(from_uri(me["manifest_path"]))
        for e in manifest:
            if e.get("status") == 2:  # DELETED entry
                continue
            df = e["data_file"]
            seq = e.get("sequence_number")
            if seq is None:  # inherited from the manifest-list entry
                seq = me.get("sequence_number", 0)
            content = df.get("content", 0)
            p = from_uri(df["file_path"])
            if content == 0:
                data_files.append((p, seq, df))
            elif content == 2:
                eq_deletes.append((p, seq, df.get("equality_ids") or []))
            elif content == 1:
                pos_deletes.append((p,))

    # field-id -> name for equality_ids resolution
    id_to_name = {f["id"]: f["name"] for f in schema["fields"]}

    import duckdb
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")

    # union of data files under the snapshot schema (missing columns —
    # pre-evolution stragglers — null-fill with the schema type)
    selects = []
    for i, (p, seq, df) in enumerate(data_files):
        cols_here = {r[0] for r in con.execute(
            "DESCRIBE SELECT * FROM read_parquet(?)", [p]).fetchall()}
        proj = []
        for name, ice in top_fields:
            if name in cols_here:
                proj.append(f'"{name}"')
            else:
                dt = duck_type(ice) or "VARCHAR"
                proj.append(f'NULL::{dt} AS "{name}"')
        pq = p.replace("'", "''")
        selects.append(
            f"SELECT {', '.join(proj)}, {seq}::BIGINT AS _seq, "
            f"'{df['file_path']}' AS _path, file_row_number AS _pos "
            f"FROM read_parquet('{pq}', file_row_number=true)")
    if not selects:
        con.execute("CREATE VIEW live AS SELECT 1 WHERE FALSE")
    else:
        con.execute("CREATE TEMP VIEW _data AS " + " UNION ALL ".join(selects))
        cond = []
        # equality deletes: row dies when a delete file with matching key
        # values exists at delete_seq > data_seq (v2 strict rule)
        for j, (p, dseq, eq_ids) in enumerate(eq_deletes):
            keys = [id_to_name[i] for i in eq_ids]
            rows, _m = read_avro(p)
            if not rows:
                continue
            import pandas as pd
            dfk = pd.DataFrame(rows)
            con.register(f"_eq{j}", dfk)
            on = " AND ".join(
                f'_data."{k}" IS NOT DISTINCT FROM _eq{j}."{k}"'
                for k in keys)
            cond.append(
                f"EXISTS (SELECT 1 FROM _eq{j} WHERE {on} "
                f"AND _data._seq < {dseq})")
        # positional deletes: (file_path, pos)
        for j, (p,) in enumerate(pos_deletes):
            rows, _m = read_avro(p)
            if not rows:
                continue
            import pandas as pd
            dfp = pd.DataFrame(rows)[["file_path", "pos"]]
            con.register(f"_pos{j}", dfp)
            cond.append(
                f"EXISTS (SELECT 1 FROM _pos{j} WHERE "
                f"_pos{j}.file_path = _data._path "
                f"AND _pos{j}.pos = _data._pos)")
        dead = " OR ".join(cond) if cond else "FALSE"
        names = ", ".join(f'"{n}"' for n, _ in top_fields)
        con.execute(
            f"CREATE VIEW live AS SELECT {names} FROM _data "
            f"WHERE NOT ({dead})")

    # digest: identical normalization to check_oracle.big_compare
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from check_oracle import _norm_expr
    con.execute("CREATE TEMP VIEW _out AS " + sql)
    cols = con.execute("DESCRIBE _out").fetchall()
    types = {c[0]: c[1] for c in cols}
    parts = ", ".join(_norm_expr(c, types[c]) for c in sorted(types))
    n, h = con.execute(
        f"SELECT count(*), sum(hash(concat_ws(chr(31), {parts}))::HUGEINT) "
        "FROM _out").fetchone()
    if dump:
        con.execute(f"COPY _out TO '{dump}' (FORMAT PARQUET)")
    print(json.dumps({"snapshot": snap_id, "rows": int(n),
                      "hash": str(h), "columns": sorted(types)}))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
