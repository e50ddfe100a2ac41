#!/usr/bin/env python3
"""Independent third READER for the graft table format (FORMAT.md).

Resolves a graft table to its live rows with an implementation that
shares no code with the Scala library OR the DuckDB SQL resolver
(Interop.oracles): pure python + pyarrow, written from FORMAT.md alone.
This is the role the reference fills with a THIRD engine suite beside
DuckDB (/root/reference/tests/daft_feature_tests.py,
clickhouse_feature_tests.py vs duckdb_feature_tests.py): every extra
zero-shared-code reader that reproduces the Spark scan hash-exactly is
independent evidence the on-disk contract — not the writer's private
conventions — carries the table.

What it replays, from the metadata alone:
  - latest (or --pin'd) metadata version, head snapshot of --ref
    (default main) or an explicit --snapshot id;
  - manifest SEGMENTS (JSONL FileMeta lines; legacy single-`manifest`
    snapshots shimmed to one segment per FORMAT.md §Round-4);
  - per-file schema alignment by FIELD ID: physical f<id> columns map
    to the presented schema's names (rename is metadata-only), type
    promotion casts at read, columns missing from a file's write-time
    schema present the v3 `initial-default` (or NULL) — gated by the
    file's manifest schemaId, never by what is physically present;
  - name-mapped (add_files) entries read by LOGICAL column name;
  - materialized lineage: a rewritten file's `_last_seq` column
    overrides the manifest sequence per row (FORMAT.md §Round-9);
  - all three delete shapes: position deletes ((file_path, pos) rows,
    entry path = DIRECTORY per FORMAT.md §Round-8), deletion vectors
    (dense java.util.BitSet image — bit j of byte k set means row
    k*8+j is dead; the LATEST entry sequence per target file wins),
    and equality deletes (keys from eqFieldIds, applied only to rows
    whose sequence predates the delete's).

Usage:
    extreader.py <table_location> <out.parquet>
                 [--ref R] [--snapshot N] [--pin V]

Writes the resolved rows (presented-schema columns, sorted by the
first column) to <out.parquet>. Exit 0 on success; any structural
surprise (unknown type, unreadable metadata, missing file) fails loudly
— a guessing reader would certify nothing.
"""
import argparse
import glob
import json
import os
import re
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def fail(msg):
    print(f"extreader: {msg}", file=sys.stderr)
    sys.exit(1)


def latest_version(loc):
    vs = []
    for p in glob.glob(os.path.join(loc, "metadata", "v*.json")):
        m = re.fullmatch(r"v(\d+)\.json", os.path.basename(p))
        if m:
            vs.append((int(m.group(1)), p))
    if not vs:
        fail(f"not a graft table (no metadata versions): {loc}")
    return max(vs)


def read_meta(loc, pin=None):
    if pin is None:
        _, path = latest_version(loc)
    else:
        path = os.path.join(loc, "metadata", f"v{pin:05d}.json")
    with open(path) as f:
        return json.load(f)


def segments_of(snap):
    # legacy shim (FORMAT.md §Round-4): pre-segmentation snapshots carry
    # one `manifest` string instead of the `manifests` list
    if "manifests" in snap:
        return snap["manifests"]
    if "manifest" in snap:
        return [snap["manifest"]]
    fail(f"snapshot {snap.get('snapshotId')} has no manifests")


def read_entries(loc, snap):
    entries = []
    for rel in segments_of(snap):
        with open(os.path.join(loc, rel)) as f:
            for line in f:
                line = line.strip()
                if line:
                    entries.append(json.loads(line))
    return entries


def schema_by_id(meta, sid):
    for s in meta["schemas"]:
        if s["schemaId"] == sid:
            return s
    fail(f"no schema {sid}")


ARROW_TYPES = {
    "bigint": pa.int64(), "long": pa.int64(),
    "int": pa.int32(), "integer": pa.int32(),
    "smallint": pa.int16(), "tinyint": pa.int8(),
    "double": pa.float64(), "float": pa.float32(),
    "string": pa.string(), "boolean": pa.bool_(),
    "date": pa.date32(), "timestamp": pa.timestamp("us"),
    "binary": pa.binary(),
}


def arrow_type(dtype):
    d = dtype.strip().lower()
    if d in ARROW_TYPES:
        return ARROW_TYPES[d]
    m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", d)
    if m:
        return pa.decimal128(int(m.group(1)), int(m.group(2)))
    fail(f"unsupported type: {dtype}")


def default_scalar(lit, typ):
    """v3 initial-default: SQL literal text -> arrow scalar.

    Only SIMPLE literals are recognized (NULL, 'quoted string', numeric,
    boolean) — the native reader evaluates full Spark `expr(...)`, so an
    expression-form default (e.g. DATE '2020-01-01') must hit the loud
    fail() path here, never a raw pyarrow traceback or a silent string
    coercion."""
    if lit is None:
        return pa.scalar(None, typ)
    s = lit.strip()
    if s.upper() == "NULL":
        return pa.scalar(None, typ)
    if s.startswith("'") and s.endswith("'") and len(s) >= 2:
        return pa.scalar(s[1:-1].replace("''", "'"), typ)
    try:
        if pa.types.is_floating(typ) or pa.types.is_decimal(typ):
            return pa.scalar(float(s), typ)
        if pa.types.is_integer(typ):
            return pa.scalar(int(s), typ)
    except ValueError:
        fail(f"unsupported initial-default literal: {lit!r}")
    if pa.types.is_boolean(typ):
        if s.lower() in ("true", "false"):
            return pa.scalar(s.lower() == "true", typ)
        fail(f"unsupported initial-default literal: {lit!r}")
    fail(f"unsupported initial-default literal for {typ}: {lit!r}")


def decode_bitset(buf):
    """java.util.BitSet.toByteArray image: bit j of byte k (LSB-first
    within the byte) set means position k*8 + j is deleted."""
    out = []
    for k, b in enumerate(buf):
        j = 0
        while b:
            if b & 1:
                out.append(k * 8 + j)
            b >>= 1
            j += 1
    return out


# Spark's key match treats NaN as equal to NaN (and null <=> null), but
# python float nan != nan — normalize NaN to a sentinel on BOTH the
# delete-key and data-row sides so a NaN-keyed equality delete kills the
# same rows the native reader kills. The sentinel is a tuple, which can
# never equal any scalar column value.
_NAN_KEY = ("__graft_eqdel_nan__",)


def norm_key(components):
    return tuple(_NAN_KEY if isinstance(v, float) and v != v else v
                 for v in components)


def read_delete_dir(loc, entry):
    """Delete entries point at parquet DIRECTORIES (FORMAT.md §Round-8)."""
    d = os.path.join(loc, entry["path"])
    parts = sorted(glob.glob(os.path.join(d, "*.parquet")))
    if not parts:
        fail(f"delete entry has no parquet under {d}")
    return pa.concat_tables([pq.read_table(p) for p in parts])


def resolve(loc, ref="main", snapshot=None, pin=None):
    meta = read_meta(loc, pin)
    if snapshot is None:
        r = meta["refs"].get(ref)
        if r is None:
            fail(f"no ref '{ref}'")
        head_id = r["snapshotId"]
    else:
        head_id = snapshot
    snap = next((s for s in meta["snapshots"] if s["snapshotId"] == head_id),
                None)
    if snap is None:
        fail(f"snapshot {head_id} not in the log")
    # presented schema: the table's current schema for a head read,
    # the snapshot's own schema when pinned to history
    sid = meta["currentSchemaId"] if snapshot is None else snap["schemaId"]
    presented = schema_by_id(meta, sid)["fields"]

    entries = read_entries(loc, snap)
    data = [e for e in entries if e["fileType"] == "data"]
    posdel = [e for e in entries if e["fileType"] == "posdel"]
    dvs = [e for e in entries if e["fileType"] == "dv"]
    eqdel = [e for e in entries if e["fileType"] == "eqdel"]

    def abspath(rel):
        return rel if rel.startswith("/") else os.path.join(loc, rel)

    # --- delete overlays -----------------------------------------------------
    # position deletes: (target file_path, pos) rows
    dead = {}  # file_path -> set(pos)
    for e in posdel:
        t = read_delete_dir(loc, e)
        for fp, pos in zip(t.column("file_path").to_pylist(),
                           t.column("pos").to_pylist()):
            dead.setdefault(fp, set()).add(pos)
    # deletion vectors: latest entry sequence per target file wins, its
    # bitmap REPLACES older vectors for that file (writers merge at
    # commit). TIES at the max sequence UNION — the native reader keeps
    # ALL max-seq vectors for a file (window filter over sequence), and
    # an external writer may legally commit two same-sequence DV entries
    # for one target; keep-first would silently resurrect rows.
    dv_latest = {}  # file_path -> (entry_seq, [bitmap_bytes, ...])
    for e in dvs:
        t = read_delete_dir(loc, e)
        seq = e["sequenceNumber"]
        for fp, buf in zip(t.column("file_path").to_pylist(),
                           t.column("dv").to_pylist()):
            cur = dv_latest.get(fp)
            if cur is None or seq > cur[0]:
                dv_latest[fp] = (seq, [buf])
            elif seq == cur[0]:
                cur[1].append(buf)
    for fp, (_, bufs) in dv_latest.items():
        for buf in bufs:
            dead.setdefault(fp, set()).update(decode_bitset(buf))
    # equality deletes: key tuple -> max delete sequence, grouped by key set
    eq_groups = {}  # tuple(field ids) -> {key tuple: max dseq}
    for e in eqdel:
        ids = tuple(e.get("eqFieldIds") or [])
        if not ids:
            fail(f"eqdel entry without eqFieldIds: {e['path']}")
        t = read_delete_dir(loc, e)
        g = eq_groups.setdefault(ids, {})
        cols = [t.column(f"f{i}").to_pylist() for i in ids]
        for raw in zip(*cols):
            key = norm_key(raw)
            if key not in g or e["sequenceNumber"] > g[key]:
                g[key] = e["sequenceNumber"]

    # --- data files: align, overlay, collect ---------------------------------
    chunks = []
    # delete rows name absolute normalized target paths; if NO data file
    # matches any overlay path the caller almost certainly aliased the
    # location (relative path, symlink) and every deleted row would
    # silently reappear — that must fail loudly, per the module contract
    overlay_matched = False
    for e in data:
        path = abspath(e["path"])
        t = pq.read_table(path)
        n = t.num_rows
        fschema = schema_by_id(meta, e["schemaId"])["fields"]
        by_id = {f["id"]: f for f in fschema}
        name_mapped = e.get("nameMapped", False)

        def col_of(f):
            """presented field -> aligned arrow array (cast / default)."""
            typ = arrow_type(f["dtype"])
            wf = by_id.get(f["id"])
            if wf is None:  # field postdates this file: v3 default or NULL
                d = f.get("initialDefault")
                if d is None:
                    return pa.nulls(n, typ)
                return pa.array([default_scalar(d, typ).as_py()] * n, typ)
            phys = wf["name"] if name_mapped else f"f{wf['id']}"
            if phys not in t.column_names:
                fail(f"{path} lacks column {phys}")
            return t.column(phys).cast(typ)

        arrays = [col_of(f) for f in presented]
        # per-row sequence: materialized _last_seq (rewritten files,
        # FORMAT.md §Round-9) overrides the manifest entry's sequence
        if "_last_seq" in t.column_names:
            seqs = t.column("_last_seq").fill_null(e["sequenceNumber"]) \
                .to_pylist()
        else:
            seqs = [e["sequenceNumber"]] * n

        # normalized absolute target path, as delete rows name it
        norm = re.sub(r"^file:/+", "/", path)
        gone = dead.get(norm, ())
        if norm in dead:
            overlay_matched = True
        if not gone and not eq_groups:  # untouched file: take it whole
            chunks.append(pa.table(
                {f["name"]: a for f, a in zip(presented, arrays)}))
            continue
        keep = []
        eq_cols = {}
        for ids, g in eq_groups.items():
            cols = []
            for i in ids:
                f = next((p for p in presented if p["id"] == i), None)
                if f is None:
                    fail(f"eq-delete field {i} dropped from schema")
                cols.append(arrays[presented.index(f)].to_pylist())
            eq_cols[ids] = (cols, g)
        for row in range(n):
            if row in gone:
                continue
            hit = False
            for ids, (cols, g) in eq_cols.items():
                key = norm_key(c[row] for c in cols)
                dseq = g.get(key)
                if dseq is not None and seqs[row] < dseq:
                    hit = True
                    break
            if not hit:
                keep.append(row)
        if keep:
            idx = pa.array(keep, pa.int64())
            chunks.append(pa.table(
                {f["name"]: a.take(idx) for f, a in zip(presented, arrays)}))

    # Aliasing signature (vs legal inert overlays): a table resolved via
    # an aliased location has overlay target paths under the REAL root,
    # so none match a data file AND none sit under the caller's location.
    # Inert overlays (targets all rewritten by later commits — legal dead
    # weight the native reader also ignores) still point under loc — OR,
    # for rewritten name-mapped/add_files imports, at ABSOLUTE
    # outside-location paths that appear in the snapshot log's manifests.
    # A target matching ANY historical manifest entry path is a real
    # table path and therefore non-aliasing evidence; only targets the
    # table has never named in any manifest indicate an aliased root.
    if (dead and data and not overlay_matched
            and not any(fp.startswith(loc + os.sep) for fp in dead)):
        known = set()
        for s in meta["snapshots"]:
            try:
                for e in read_entries(loc, s):
                    known.add(re.sub(r"^file:/+", "/", abspath(e["path"])))
            except Exception:
                pass  # expired/pruned segments: absence proves nothing
        if not any(fp in known for fp in dead):
            fail("posdel/DV overlays matched zero data-file paths, none "
                 "target the given location, and none match any manifest "
                 "entry path — it is likely aliased (relative path or "
                 "symlink); invoke with the canonical absolute path")
    names = [f["name"] for f in presented]
    if chunks:
        out = pa.concat_tables(chunks)
    else:
        out = pa.table({f["name"]: pa.nulls(0, arrow_type(f["dtype"]))
                        for f in presented})
    return out.sort_by(names[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("location")
    ap.add_argument("out")
    ap.add_argument("--ref", default="main")
    ap.add_argument("--snapshot", type=int, default=None)
    ap.add_argument("--pin", type=int, default=None,
                    help="metadata version to resolve (default: latest)")
    a = ap.parse_args()
    # delete rows store absolute normalized paths: resolve symlinks and
    # relative invocations so overlay path matching sees the same canonical
    # location the writer recorded
    table = resolve(os.path.realpath(a.location), a.ref, a.snapshot, a.pin)
    pq.write_table(table, a.out)
    print(f"extreader: {table.num_rows} rows -> {a.out}")


if __name__ == "__main__":
    main()
