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

rows.json: {"rows": [{<logical col>: <value>, ...}, ...]}

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
    if len(argv) != 2:
        fail(__doc__)
    loc, rows_path = argv

    base_v = pin if pin is not None else current_version(loc)
    with open(os.path.join(loc, "metadata", f"v{base_v:05d}.json")) as f:
        meta = json.load(f)
    with open(rows_path) as f:
        rows = json.load(f)["rows"]
    if not rows:
        fail("no rows to append")

    schema = next(s for s in meta["schemas"]
                  if s["schemaId"] == meta["currentSchemaId"])
    spec = next(s for s in meta["specs"] if s["specId"] == meta["currentSpecId"])
    if spec["fields"]:
        fail("this writer handles unpartitioned tables only")
    for fld in schema["fields"]:
        if fld["dtype"] not in ARROW_TYPES:
            fail(f"unsupported column type {fld['dtype']} ({fld['name']})")

    snap_id = meta["lastSnapshotId"] + 1
    seq = meta["lastSequenceNumber"] + 1
    tag = uuid.uuid4().hex[:8]

    # --- data file: physical f<id> columns, one parquet file ---------------
    arrays, stats = {}, {}
    for fld in schema["fields"]:
        vals = [r.get(fld["name"]) for r in rows]
        arrays[f"f{fld['id']}"] = pa.array(vals, type=ARROW_TYPES[fld["dtype"]])
        mn, mx = stat_str(vals, fld["dtype"])
        stats[str(fld["id"])] = {
            "min": mn, "max": mx,
            "nullCount": sum(1 for v in vals if v is None),
        }
    rel_data_dir = f"data/s{snap_id}-{tag}"
    os.makedirs(os.path.join(loc, rel_data_dir), exist_ok=True)
    rel_data = f"{rel_data_dir}/part-00000-ext.parquet"
    pq.write_table(pa.table(arrays), os.path.join(loc, rel_data))

    # --- manifest segment: one FileMeta JSONL line, atomic rename ----------
    entry = {
        "path": rel_data,
        "fileType": "data",
        "specId": meta["currentSpecId"],
        "schemaId": meta["currentSchemaId"],
        "partition": {},
        "rowCount": len(rows),
        "sizeBytes": os.path.getsize(os.path.join(loc, rel_data)),
        "sequenceNumber": seq,
        "stats": {k: {kk: vv for kk, vv in v.items() if vv is not None}
                  for k, v in stats.items()},
        "eqFieldIds": [],
        # v3 row lineage: this file's rows get ids [lastRowId, +rowCount)
        "firstRowId": meta["lastRowId"],
        "nameMapped": False,
    }
    seg_name = f"{snap_id}-a-{tag}.jsonl"
    seg_rel = f"manifests/{seg_name}"
    os.makedirs(os.path.join(loc, "manifests"), exist_ok=True)
    tmp_seg = os.path.join(loc, "manifests", f".{seg_name}.tmp")
    with open(tmp_seg, "w") as f:
        f.write(json.dumps(entry))
    os.rename(tmp_seg, os.path.join(loc, seg_rel))

    # --- new snapshot + table state ----------------------------------------
    parent = None
    if "main" in meta["refs"]:
        parent = meta["refs"]["main"]["snapshotId"]
    parent_snap = next((s for s in meta["snapshots"]
                        if s["snapshotId"] == parent), None)
    snapshot = {
        "snapshotId": snap_id,
        "sequenceNumber": seq,
        "timestampMs": int(time.time() * 1000),
        "operation": "append",
        "schemaId": meta["currentSchemaId"],
        # parent segments carried BY REFERENCE + the fresh added segment
        "manifests": (parent_snap["manifests"] if parent_snap else []) + [seg_rel],
        "summary": {
            "added-data-files": "1",
            "added-delete-files": "0",
            "added-records": str(len(rows)),
            "removed-files": "0",
            "removed-records": "0",
        },
    }
    if parent is not None:
        snapshot["parentId"] = parent

    meta["lastSnapshotId"] = snap_id
    meta["lastSequenceNumber"] = seq
    meta["lastRowId"] = meta["lastRowId"] + len(rows)
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
