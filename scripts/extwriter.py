#!/usr/bin/env python3
"""Independent second WRITER for the graft table format (FORMAT.md).

Appends rows to an existing graft table with an implementation that
shares no code with the Scala library: writes a parquet data file
(physical f<id> columns), one manifest SEGMENT (FileMeta JSONL, atomic
rename), and CAS-publishes metadata v(N+1) via hard-link create-new —
the exact commit protocol of FORMAT.md. This is the write-side mirror
of the DuckDB independent READER (Interop.oracles): together they prove
the format contract from both directions, the way the reference proves
Iceberg with pyiceberg/Flink write suites against Spark reads
(/root/reference/tests/pyiceberg_feature_tests.py,
flink_feature_tests.py).

Usage:
    extwriter.py <table_location> <rows.json> [--pin N]
    extwriter.py <table_location> --delete <col> <values.json> [--pin N]
    extwriter.py <table_location> --delete-eq <col> <values.json> [--pin N]

rows.json:   {"rows": [{<logical col>: <value>, ...}, ...]}
values.json: {"values": [<v>, ...]}  (rows whose <col> is in the list
             are deleted, merge-on-read)

`--delete` writes a POSITION-DELETE file: it walks the head snapshot's
live data files from the manifests, reads each file's physical f<id>
column with pyarrow to find matching row indices, and commits a
(file_path, pos) parquet + manifest entry + CAS version.

`--delete-eq` writes an EQUALITY-DELETE file: key values under the
physical column name, applying (by the format's sequence gate) only to
rows whose data file carries an OLDER sequence number — rows appended
after this delete survive. Both prove the merge-on-read write path
from outside the JVM.

--pin N: base the commit on metadata version N specifically and attempt
to publish at exactly N+1 with NO retry — exits 2 on a create-new
conflict (another writer already published N+1). This is the
exactly-one-wins CAS surface the race spec drives.

Exit codes: 0 = committed, 2 = commit conflict (version already
published), 1 = any other error.

Scope: unpartitioned tables, bigint/string/double columns — the minimal
writer that still exercises every format surface an append touches
(physical field-id columns, footer-equivalent stats, row lineage,
segment-by-reference manifests, snapshot summary, CAS publish).
"""
import json
import math
import os
import re
import sys
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

ARROW_TYPES = {
    "bigint": pa.int64(),
    "string": pa.string(),
    "double": pa.float64(),
}


def fail(msg, code=1):
    print(f"extwriter: {msg}", file=sys.stderr)
    sys.exit(code)


def current_version(loc):
    mdir = os.path.join(loc, "metadata")
    best = None
    for name in os.listdir(mdir):
        m = re.fullmatch(r"v(\d+)\.json", name)
        if m:
            v = int(m.group(1))
            best = v if best is None else max(best, v)
    if best is None:
        fail(f"not a graft table: {loc}")
    return best


def stat_str(values, dtype):
    """manifest stat encoding per FORMAT.md: plain decimal strings for
    numerics, raw strings for text (all values here are short)"""
    nn = [v for v in values if v is not None]
    if not nn:
        return None, None
    if dtype == "string":
        return min(nn), max(nn)
    # Non-finite doubles have no decimal rendering the Scala reader's
    # BigDecimal(stat) can parse — a committed 'nan'/'inf' stat would
    # crash every PRUNED scan at read time, long after this writer
    # exited. Omit the column's stats instead: pruning treats missing
    # stats as keep-file, so the commit stays correct, just unpruned.
    if any(isinstance(v, float) and not math.isfinite(v) for v in nn):
        return None, None
    # int/double render via repr, matching the Scala side's toString for
    # the integer/short-double values this writer handles
    return repr(min(nn)), repr(max(nn))


def main():
    argv = sys.argv[1:]
    pin = None
    if "--pin" in argv:
        i = argv.index("--pin")
        pin = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    delete_col = eq_col = None
    if "--delete" in argv:
        i = argv.index("--delete")
        delete_col = argv[i + 1]
        argv = argv[:i] + [argv[i + 2]] + argv[i + 3:]
    if "--delete-eq" in argv:
        i = argv.index("--delete-eq")
        eq_col = argv[i + 1]
        argv = argv[:i] + [argv[i + 2]] + argv[i + 3:]
    if len(argv) != 2:
        fail(__doc__)
    loc, payload_path = argv

    base_v = pin if pin is not None else current_version(loc)
    with open(os.path.join(loc, "metadata", f"v{base_v:05d}.json")) as f:
        meta = json.load(f)

    schema = next(s for s in meta["schemas"]
                  if s["schemaId"] == meta["currentSchemaId"])
    spec = next(s for s in meta["specs"] if s["specId"] == meta["currentSpecId"])
    # appends support unpartitioned and identity-partitioned layouts; the
    # delete modes are partition-agnostic (they address files by path)
    if delete_col is None and eq_col is None and any(
            f["transform"] != "identity" for f in spec["fields"]):
        fail("this writer appends only to identity partition transforms")
    for fld in schema["fields"]:
        if fld["dtype"] not in ARROW_TYPES:
            fail(f"unsupported column type {fld['dtype']} ({fld['name']})")

    snap_id = meta["lastSnapshotId"] + 1
    seq = meta["lastSequenceNumber"] + 1
    tag = uuid.uuid4().hex[:8]

    parent = None
    if "main" in meta["refs"]:
        parent = meta["refs"]["main"]["snapshotId"]
    parent_snap = next((s for s in meta["snapshots"]
                        if s["snapshotId"] == parent), None)

    if eq_col is not None:
        with open(payload_path) as f:
            values = json.load(f)["values"]
        fld = next((f for f in schema["fields"] if f["name"] == eq_col),
                   None) or fail(f"no column {eq_col}")
        rel_del_dir = f"deletes/eq{snap_id}-{tag}"
        os.makedirs(os.path.join(loc, rel_del_dir), exist_ok=True)
        rel_file = f"{rel_del_dir}/part-00000-ext.parquet"
        pq.write_table(pa.table({
            f"f{fld['id']}": pa.array(values, type=ARROW_TYPES[fld["dtype"]]),
        }), os.path.join(loc, rel_file))
        entry = {
            # delete entries point at the parquet DIRECTORY (FORMAT.md;
            # the independent resolver joins on path || '/%')
            "path": rel_del_dir,
            "fileType": "eqdel",
            "specId": meta["currentSpecId"],
            "schemaId": meta["currentSchemaId"],
            "partition": {},
            "rowCount": len(values),
            "sizeBytes": os.path.getsize(os.path.join(loc, rel_file)),
            "sequenceNumber": seq,
            "stats": {},
            "eqFieldIds": [fld["id"]],
            "firstRowId": -1,
            "nameMapped": False,
        }
        operation = "delete"
        summary = {
            "added-data-files": "0",
            "added-delete-files": "1",
            "added-records": "0",
            "removed-files": "0",
            "removed-records": "0",
        }
        new_last_row_id = meta["lastRowId"]
    elif delete_col is None:
        with open(payload_path) as f:
            rows = json.load(f)["rows"]
        if not rows:
            fail("no rows to append")
        # --- data files: physical f<id> columns, one file per partition ----
        # identity partitions: rows group by their partition tuple; each
        # group lands under the native _p_<name>=<value> dir layout with
        # the partition values in its manifest entry (what pruning reads)
        part_fields = spec["fields"]
        col_of = {f2["id"]: f2["name"] for f2 in schema["fields"]}

        def esc(v):
            return "".join(c if c.isalnum() or c in "._-" else "%%%02X" % ord(c)
                           for c in str(v))

        groups = {}
        for r in rows:
            key = tuple(str(r[col_of[pf["sourceIds"][0]]]) for pf in part_fields)
            groups.setdefault(key, []).append(r)
        rel_data_dir = f"data/s{snap_id}-{tag}"
        new_entries = []
        first_rid = meta["lastRowId"]
        for key in sorted(groups):
            grows = groups[key]
            sub = "/".join(f"_p_{pf['name']}={esc(v)}"
                           for pf, v in zip(part_fields, key))
            d = f"{rel_data_dir}/{sub}" if sub else rel_data_dir
            os.makedirs(os.path.join(loc, d), exist_ok=True)
            rel_file = f"{d}/part-00000-ext.parquet"
            arrays, stats = {}, {}
            for fld in schema["fields"]:
                vals = [r.get(fld["name"]) for r in grows]
                arrays[f"f{fld['id']}"] = pa.array(vals,
                                                   type=ARROW_TYPES[fld["dtype"]])
                mn, mx = stat_str(vals, fld["dtype"])
                stats[str(fld["id"])] = {
                    "min": mn, "max": mx,
                    "nullCount": sum(1 for v in vals if v is None),
                }
            pq.write_table(pa.table(arrays), os.path.join(loc, rel_file))
            new_entries.append({
                "path": rel_file,
                "fileType": "data",
                "specId": meta["currentSpecId"],
                "schemaId": meta["currentSchemaId"],
                "partition": {pf["name"]: str(v)
                              for pf, v in zip(part_fields, key)},
                "rowCount": len(grows),
                "sizeBytes": os.path.getsize(os.path.join(loc, rel_file)),
                "sequenceNumber": seq,
                "stats": {k: {kk: vv for kk, vv in v.items() if vv is not None}
                          for k, v in stats.items()},
                "eqFieldIds": [],
                # v3 row lineage: each file's rows get sequential ids
                "firstRowId": first_rid,
                "nameMapped": False,
            })
            first_rid += len(grows)
        entry = None
        operation = "append"
        summary = {
            "added-data-files": str(len(new_entries)),
            "added-delete-files": "0",
            "added-records": str(len(rows)),
            "removed-files": "0",
            "removed-records": "0",
        }
        new_last_row_id = meta["lastRowId"] + len(rows)
    else:
        with open(payload_path) as f:
            values = set(json.load(f)["values"])
        fld = next((f for f in schema["fields"] if f["name"] == delete_col),
                   None) or fail(f"no column {delete_col}")
        phys = f"f{fld['id']}"
        # --- find (file, pos) hits: walk the head snapshot's live data
        # files from the manifests, read the one physical column ------------
        if parent_snap is None:
            fail("cannot delete from an empty table")
        entries = []
        for seg in parent_snap["manifests"]:
            with open(os.path.join(loc, seg)) as f:
                entries += [json.loads(line) for line in f if line.strip()]
        hits_fp, hits_pos = [], []
        for e in entries:
            if e["fileType"] != "data":
                continue
            abs_path = os.path.abspath(os.path.join(loc, e["path"]))
            col = pq.read_table(abs_path, columns=[phys])[phys]
            # pos = row index within the FILE (pyarrow reads in file order,
            # matching Spark's _metadata.row_index)
            for pos, v in enumerate(col.to_pylist()):
                if v in values:
                    hits_fp.append(abs_path)
                    hits_pos.append(pos)
        rel_del_dir = f"deletes/pd{snap_id}-{tag}"
        os.makedirs(os.path.join(loc, rel_del_dir), exist_ok=True)
        rel_file = f"{rel_del_dir}/part-00000-ext.parquet"
        pq.write_table(pa.table({
            "file_path": pa.array(hits_fp, type=pa.string()),
            "pos": pa.array(hits_pos, type=pa.int64()),
        }), os.path.join(loc, rel_file))
        entry = {
            # delete entries point at the parquet DIRECTORY (FORMAT.md)
            "path": rel_del_dir,
            "fileType": "posdel",
            "specId": meta["currentSpecId"],
            "schemaId": meta["currentSchemaId"],
            "partition": {},
            "rowCount": len(hits_pos),
            "sizeBytes": os.path.getsize(os.path.join(loc, rel_file)),
            "sequenceNumber": seq,
            "stats": {},
            "eqFieldIds": [],
            "firstRowId": -1,
            "nameMapped": False,
        }
        operation, n_records = "delete", len(hits_pos)
        summary = {
            "added-data-files": "0",
            "added-delete-files": "1",
            "added-records": "0",
            "removed-files": "0",
            "removed-records": "0",
        }
        new_last_row_id = meta["lastRowId"]

    # --- manifest segment: one FileMeta JSONL line per file, atomic rename -
    if entry is not None:
        new_entries = [entry]
    seg_name = f"{snap_id}-a-{tag}.jsonl"
    seg_rel = f"manifests/{seg_name}"
    os.makedirs(os.path.join(loc, "manifests"), exist_ok=True)
    tmp_seg = os.path.join(loc, "manifests", f".{seg_name}.tmp")
    with open(tmp_seg, "w") as f:
        f.write("\n".join(json.dumps(e) for e in new_entries))
    os.rename(tmp_seg, os.path.join(loc, seg_rel))

    # --- new snapshot + table state ----------------------------------------
    snapshot = {
        "snapshotId": snap_id,
        "sequenceNumber": seq,
        "timestampMs": int(time.time() * 1000),
        "operation": operation,
        "schemaId": meta["currentSchemaId"],
        # parent segments carried BY REFERENCE + the fresh added segment
        "manifests": (parent_snap["manifests"] if parent_snap else []) + [seg_rel],
        "summary": summary,
    }
    if parent is not None:
        snapshot["parentId"] = parent

    meta["lastSnapshotId"] = snap_id
    meta["lastSequenceNumber"] = seq
    meta["lastRowId"] = new_last_row_id
    meta["snapshots"] = meta["snapshots"] + [snapshot]
    meta["refs"] = dict(meta["refs"])
    meta["refs"]["main"] = {"snapshotId": snap_id, "isBranch": True}

    # --- CAS publish: tmp write, hard-link create-new ----------------------
    target = os.path.join(loc, "metadata", f"v{base_v + 1:05d}.json")
    tmp_md = os.path.join(loc, "metadata", f".v{base_v + 1}-{tag}.json.tmp")
    with open(tmp_md, "w") as f:
        json.dump(meta, f, indent=2)
    try:
        os.link(tmp_md, target)
    except FileExistsError:
        os.unlink(tmp_md)
        fail(f"metadata version {base_v + 1} was published concurrently", 2)
    os.unlink(tmp_md)
    print(f"committed snapshot {snap_id} (seq {seq}) as v{base_v + 1:05d}")


if __name__ == "__main__":
    main()
