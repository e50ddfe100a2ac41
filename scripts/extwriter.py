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
    extwriter.py <table_location> <rows.json> [--pin N] [--branch B]
    extwriter.py <table_location> --delete <col> <values.json> [--pin N]
    extwriter.py <table_location> --delete-eq <col> <values.json> [--pin N]
    extwriter.py <table_location> --update <col> <update.json> [--pin N]
    extwriter.py <table_location> --merge <col> <merge.json> [--pin N]
    extwriter.py <table_location> --add-column <name> <dtype> \
                 [--default <sql literal>] [--pin N]

rows.json:   {"rows": [{<logical col>: <value>, ...}, ...]}
values.json: {"values": [<v>, ...]}  (rows whose <col> is in the list
             are deleted, merge-on-read)
update.json: {"values": [<v>, ...], "set": {"col": <name>, "add": <x>}}
             (rows whose <col> is in the list get set.col += set.add,
             COPY-ON-WRITE)
merge.json:  {"rows": [{<logical col>: <value>, ...}, ...]}
             (MERGE keyed on <col>: live target rows whose key matches a
             source row are REWRITTEN with the source's values, source
             rows matching nothing are INSERTED — one commit)

`--update` is the external COPY-ON-WRITE row rewrite (mirroring the
reference's second-writer update/merge proof,
/root/reference/tests/pyiceberg_feature_tests.py:196): it locates the
data files containing matching rows, rewrites each affected file WITHOUT
the old row versions (updated values, per-row lineage materialized as
_row_id/_last_seq columns so v3 row identity survives the rewrite),
carries every untouched file forward by segment reference, rewrites only
the manifest segments that lost entries (survivors merged into one), and
publishes a single 'overwrite' CAS commit whose summary truthfully
reports added+removed files — which scanIncremental then refuses, per
the round-8 amendment.

Live MoR overlays (position deletes, sequence-gated equality deletes,
deletion vectors) are RESOLVED during the rewrite: deleted rows of an
affected file stay out of the rewritten file, and overlay entries whose
remaining targets were all rewritten are dropped from the manifests in
the same commit — a kept overlay still applies to the surviving files
it targets (its rows naming rewritten paths are inert; liveness comes
from the manifest join). Schema-evolved tables are handled the way the
readers present them: a column physically missing from a file whose
schemaId predates it is materialized as the field's v3 initialDefault
(not NULL) in the rewritten file, which stamps currentSchemaId.

`--merge` is the external UPSERT on the same machinery
(pyiceberg_feature_tests.py:196's write_merge_update_delete from the
second implementation): affected files rewritten with matched rows
replaced by their source row (lineage preserved, _last_seq bumped),
unmatched source rows appended as fresh-lineage inserts, one
'overwrite' commit. Duplicate source keys are refused (ambiguous
merge, matching the Scala writer's cardinality rule). A key whose only
target rows are MoR-deleted counts as unmatched and inserts.

Scope of both rewrites: unpartitioned tables; name-mapped (registered)
files are refused rather than guessed at.

`--add-column` is the external SCHEMA-EVOLUTION commit (mirroring
pyiceberg_feature_tests.py:336): a METADATA-ONLY publish that appends a
new schema version (fresh field id, optional v3 initial-default), bumps
currentSchemaId/lastSchemaId/lastFieldId, and adds NO snapshot — the
commit-base rule of FORMAT.md §Round-4 exists precisely for such
version-without-snapshot commits. A following append (this writer or
Spark) writes the new physical f<id> column; readers present the
default for files committed under older schema ids.

`--delete` writes a POSITION-DELETE file: it walks the head snapshot's
live data files from the manifests, reads each file's physical f<id>
column with pyarrow to find matching row indices, and commits a
(file_path, pos) parquet + manifest entry + CAS version.

`--delete-eq` writes an EQUALITY-DELETE file: key values under the
physical column name, applying (by the format's sequence gate) only to
rows whose data file carries an OLDER sequence number — rows appended
after this delete survive. Both prove the merge-on-read write path
from outside the JVM.

--branch B: commit to branch ref B instead of main — the WAP flow's
audit-branch write from the SECOND implementation (the reference's WAP
is branch-first). B must already exist as a BRANCH ref (create it with
the native writer's createBranch); the commit's snapshot parents off
B's head, its row-op modes (--delete/--update/--merge) address B's
live files, and only refs.B moves — main is untouched. The CAS publish
is version-level and branch-independent: two pinned commits to
DIFFERENT branches from one base still race, exactly one wins.

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


def cas_publish(loc, meta, base_v, tag):
    """publish `meta` as v(base_v+1) via tmp write + hard-link create-new;
    exits 2 on a conflict (another writer already published)"""
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


def parse_default(fld):
    """a field's v3 initialDefault as a python value of its dtype
    (string literals may carry SQL quotes)"""
    lit = fld.get("initialDefault")
    if lit is None:
        return None
    if fld["dtype"] == "bigint":
        return int(lit)
    if fld["dtype"] == "double":
        return float(lit)
    s = str(lit)
    if len(s) >= 2 and s[0] == "'" and s[-1] == "'":
        return s[1:-1]
    return s


def read_logical(loc, meta, schema, e):
    """one data file as per-physical-column python lists under the
    CURRENT schema, with the schemaId-gated v3 initialDefault
    materialized (a column physically missing from a file whose
    schemaId predates it presents the DEFAULT, exactly as both readers
    do — a rewrite stamping currentSchemaId must bake that value in,
    or the rows silently flip to NULL); lineage columns resolved to
    per-row values"""
    t = pq.read_table(os.path.join(loc, e["path"]))
    names = set(t.schema.names)
    fsch = next((s for s in meta["schemas"]
                 if s["schemaId"] == e["schemaId"]), None)
    file_fids = {f["id"] for f in fsch["fields"]} if fsch else set()
    cols = {}
    for fld in schema["fields"]:
        phys = f"f{fld['id']}"
        if phys in names:
            cols[phys] = t[phys].to_pylist()
        elif fld["id"] not in file_fids:
            cols[phys] = [parse_default(fld)] * t.num_rows
        else:
            cols[phys] = [None] * t.num_rows
    rid = (t["_row_id"].to_pylist() if "_row_id" in names
           else [None] * t.num_rows)
    lseq = (t["_last_seq"].to_pylist() if "_last_seq" in names
            else [None] * t.num_rows)
    return t.num_rows, cols, rid, lseq


def load_overlays(loc, flat):
    """live MoR overlays of the head snapshot, resolved for a rewrite:
      pos_by_file: {abs target path: deleted position set}
                   (position deletes ∪ LATEST-sequence deletion vector
                   per file — the format's DV supersession rule)
      eqdels:      [(field ids, key-tuple set, delete seq), ...]
                   (apply to rows of data files OLDER than the delete)
      targets:     {overlay entry path: abs target path set | None}
                   (None for eqdels — their targets are seq-implicit)"""
    pos_by_file, eqdels, targets = {}, [], {}
    dv_latest = {}  # abs target -> (entry seq, position set)
    for e in flat:
        if e["fileType"] == "data":
            continue
        t = pq.read_table(os.path.join(loc, e["path"]))
        if e["fileType"] == "posdel":
            tg = set()
            for fp, pos in zip(t["file_path"].to_pylist(),
                               t["pos"].to_pylist()):
                pos_by_file.setdefault(fp, set()).add(pos)
                tg.add(fp)
            targets[e["path"]] = tg
        elif e["fileType"] == "dv":
            tg = set()
            for fp, dv in zip(t["file_path"].to_pylist(),
                              t["dv"].to_pylist()):
                # dense BitSet image, LSB-first within each byte
                ps = {i * 8 + j for i, b in enumerate(dv)
                      for j in range(8) if (b >> j) & 1}
                tg.add(fp)
                prev = dv_latest.get(fp)
                if prev is None or e["sequenceNumber"] > prev[0]:
                    dv_latest[fp] = (e["sequenceNumber"], ps)
            targets[e["path"]] = tg
        elif e["fileType"] == "eqdel":
            fids = e.get("eqFieldIds") or []
            keys = (set(zip(*(t[f"f{fid}"].to_pylist() for fid in fids)))
                    if t.num_rows and fids else set())
            eqdels.append((fids, keys, e["sequenceNumber"]))
            targets[e["path"]] = None
    for fp, (_, ps) in dv_latest.items():
        pos_by_file.setdefault(fp, set()).update(ps)
    return pos_by_file, eqdels, targets


def overlay_keep_paths(loc, flat, affected, targets):
    """overlay entries still needed once `affected` data files are
    rewritten: a posdel/dv survives iff it targets at least one
    UNTOUCHED live data file (its rows naming rewritten paths are inert
    — liveness comes from the manifest join); an eqdel survives iff any
    untouched file is older than it. Everything else was consumed by
    the rewrite and drops from the manifests in the same commit."""
    surv = [e for e in flat
            if e["fileType"] == "data" and e["path"] not in affected]
    surv_abs = {os.path.abspath(os.path.join(loc, e["path"])) for e in surv}
    keep = set()
    for e in flat:
        if e["fileType"] == "data":
            continue
        if e["fileType"] == "eqdel":
            if any(d["sequenceNumber"] < e["sequenceNumber"] for d in surv):
                keep.add(e["path"])
        elif targets.get(e["path"]) and targets[e["path"]] & surv_abs:
            keep.add(e["path"])
    return keep


def main():
    argv = sys.argv[1:]
    if argv and argv[0] == "--ops":
        # batch mode: one interpreter, N sequential single-op invocations.
        # ops.json = {"ops": [[<argv of one normal invocation>], ...]} —
        # each op re-reads the table's current metadata exactly as a
        # separate process would, so the committed history is identical;
        # only the repeated python+pyarrow startup cost is shared.
        if len(argv) != 2:
            fail(__doc__)
        with open(argv[1]) as f:
            ops = json.load(f)["ops"]
        for op in ops:
            run_one([str(a) for a in op])
        return
    run_one(argv)


def run_one(argv):
    pin = None
    if "--pin" in argv:
        i = argv.index("--pin")
        pin = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    branch = "main"
    if "--branch" in argv:
        i = argv.index("--branch")
        branch = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    default_lit = None
    if "--default" in argv:
        i = argv.index("--default")
        default_lit = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    delete_col = eq_col = update_col = merge_col = add_col = None
    if "--delete" in argv:
        i = argv.index("--delete")
        delete_col = argv[i + 1]
        argv = argv[:i] + [argv[i + 2]] + argv[i + 3:]
    if "--delete-eq" in argv:
        i = argv.index("--delete-eq")
        eq_col = argv[i + 1]
        argv = argv[:i] + [argv[i + 2]] + argv[i + 3:]
    if "--update" in argv:
        i = argv.index("--update")
        update_col = argv[i + 1]
        argv = argv[:i] + [argv[i + 2]] + argv[i + 3:]
    if "--merge" in argv:
        i = argv.index("--merge")
        merge_col = argv[i + 1]
        argv = argv[:i] + [argv[i + 2]] + argv[i + 3:]
    if "--add-column" in argv:
        i = argv.index("--add-column")
        add_col = (argv[i + 1], argv[i + 2])
        argv = argv[:i] + argv[i + 3:] + ["<none>"]
    if len(argv) != 2:
        fail(__doc__)
    loc, payload_path = argv

    base_v = pin if pin is not None else current_version(loc)
    with open(os.path.join(loc, "metadata", f"v{base_v:05d}.json")) as f:
        meta = json.load(f)

    schema = next(s for s in meta["schemas"]
                  if s["schemaId"] == meta["currentSchemaId"])
    spec = next(s for s in meta["specs"] if s["specId"] == meta["currentSpecId"])

    if add_col is not None:
        # --- external schema evolution: METADATA-ONLY commit ---------------
        name, dtype = add_col
        if dtype not in ARROW_TYPES:
            fail(f"unsupported column type {dtype}")
        if any(f["name"] == name for f in schema["fields"]):
            fail(f"column {name} already exists")
        fid = meta["lastFieldId"] + 1
        sid = meta["lastSchemaId"] + 1
        field = {"id": fid, "name": name, "dtype": dtype, "nullable": True}
        if default_lit is not None:
            field["initialDefault"] = default_lit
        meta["schemas"] = meta["schemas"] + [
            {"schemaId": sid, "fields": schema["fields"] + [field]}]
        meta["currentSchemaId"] = sid
        meta["lastSchemaId"] = sid
        meta["lastFieldId"] = fid
        # no snapshot: schema evolution advances the VERSION only — the
        # exact shape FORMAT.md's commit-base rule exists for
        tag0 = uuid.uuid4().hex[:8]
        cas_publish(loc, meta, base_v, tag0)
        print(f"committed schema {sid} (field f{fid} {name} {dtype}"
              + (f" default {default_lit}" if default_lit is not None else "")
              + f") as v{base_v + 1:05d}")
        return
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
    if branch in meta["refs"]:
        ref = meta["refs"][branch]
        if not ref.get("isBranch", False):
            fail(f"ref {branch} is a tag, not a branch")
        parent = ref["snapshotId"]
    elif branch != "main":
        # WAP creates the audit branch first; a typo'd branch must not
        # silently fork fresh history
        fail(f"branch {branch} does not exist (create it before writing)")
    parent_snap = next((s for s in meta["snapshots"]
                        if s["snapshotId"] == parent), None)

    # manifest-segment plan: branches that only ADD files carry every
    # parent segment by reference (carried=None → default below); the
    # copy-on-write update sets its own carried/survivor split
    carried = None
    survivors = []

    if update_col is not None or merge_col is not None:
        # --- external COPY-ON-WRITE rewrite: --update / --merge ------------
        with open(payload_path) as f:
            pl = json.load(f)
        key_name = update_col if update_col is not None else merge_col
        key_fld = next((f2 for f2 in schema["fields"]
                        if f2["name"] == key_name),
                       None) or fail(f"no column {key_name}")
        key_phys = f"f{key_fld['id']}"
        if spec["fields"]:
            fail("this writer rewrites only unpartitioned tables")
        if parent_snap is None:
            fail("cannot rewrite an empty table")
        if update_col is not None:
            values = set(pl["values"])
            set_name = pl["set"]["col"]
            delta = pl["set"]["add"]
            set_fld = next((f2 for f2 in schema["fields"]
                            if f2["name"] == set_name),
                           None) or fail(f"no column {set_name}")
            if set_fld["dtype"] not in ("double", "bigint"):
                fail("--update sets numeric columns only")
            set_phys = f"f{set_fld['id']}"
            src_by_key = None
        else:
            # upsert source keyed on <col>: duplicate keys would make the
            # rewrite ambiguous (same rule as the Scala writer's MERGE
            # cardinality guard) — refuse up front
            src_by_key = {}
            for r in pl["rows"]:
                k = r.get(key_name)
                if k in src_by_key:
                    fail("--merge source has duplicate keys (ambiguous merge)")
                src_by_key[k] = r
            if not src_by_key:
                fail("--merge needs at least one source row")
            values = set(src_by_key)
        # per-segment entry lists: segment identity drives the
        # carry-by-reference vs rewrite split below
        seg_entries = []
        for seg in parent_snap["manifests"]:
            with open(os.path.join(loc, seg)) as f:
                seg_entries.append(
                    (seg, [json.loads(line) for line in f if line.strip()]))
        flat = [e for _, es in seg_entries for e in es]
        if any(e.get("nameMapped") for e in flat):
            fail("rewrites do not touch name-mapped (registered) files")
        data_entries = [e for e in flat if e["fileType"] == "data"]
        # live MoR overlays resolve DURING the rewrite: deleted rows stay
        # out of the rewritten file; fully-consumed overlay entries drop
        # from the manifests in this same commit (overlay_keep_paths)
        pos_by_file, eqdels, ov_targets = load_overlays(loc, flat)

        def row_dead(e, i, cols, dead_pos):
            if i in dead_pos:
                return True
            for fids, keys, dseq in eqdels:
                if e["sequenceNumber"] < dseq and \
                        tuple(cols[f"f{fid}"][i] for fid in fids) in keys:
                    return True
            return False
        # affected files: one key-column read per data file (the pyarrow
        # analog of the Scala side's _metadata.file_path semi-join); a
        # key column missing from a pre-evolution file presents its
        # initialDefault, the way both readers resolve it
        affected = set()
        for e in data_entries:
            fnames = pq.read_schema(os.path.join(loc, e["path"])).names
            if key_phys in fnames:
                colv = pq.read_table(os.path.join(loc, e["path"]),
                                     columns=[key_phys])[key_phys].to_pylist()
            else:
                colv = [parse_default(key_fld)] * e["rowCount"]
            if any(v in values for v in colv):
                affected.add(e["path"])
        if update_col is not None and not affected:
            fail("no rows match --update")
        # rewrite every affected file: hit rows updated (--update) or
        # replaced by their source row (--merge), untouched rows carried,
        # MoR-deleted rows resolved away, per-row lineage MATERIALIZED as
        # _row_id/_last_seq columns so v3 row identity survives the
        # rewrite (hit rows bump to this commit's sequence)
        out_cols = {f"f{f2['id']}": [] for f2 in schema["fields"]}
        out_rid, out_lseq = [], []
        n_rows = removed_records = 0
        matched_keys = set()
        for e in data_entries:
            if e["path"] not in affected:
                continue
            removed_records += e["rowCount"]
            nr, cols, rid, lseq = read_logical(loc, meta, schema, e)
            dead_pos = pos_by_file.get(
                os.path.abspath(os.path.join(loc, e["path"])), set())
            for i in range(nr):
                if row_dead(e, i, cols, dead_pos):
                    continue
                hit = cols[key_phys][i] in values
                if hit and src_by_key is not None:
                    matched_keys.add(cols[key_phys][i])
                    src = src_by_key[cols[key_phys][i]]
                for f2 in schema["fields"]:
                    phys = f"f{f2['id']}"
                    v = cols[phys][i]
                    if hit:
                        if src_by_key is None:
                            if phys == set_phys:
                                v = v + delta
                        elif f2["name"] in src:
                            v = src[f2["name"]]
                    out_cols[phys].append(v)
                out_rid.append(rid[i] if rid[i] is not None
                               else e["firstRowId"] + i)
                out_lseq.append(seq if hit else
                                (lseq[i] if lseq[i] is not None
                                 else e["sequenceNumber"]))
                n_rows += 1
        if src_by_key is not None:
            # merge inserts: source keys matching no LIVE target row (a
            # key whose only rows were MoR-deleted inserts — dead rows
            # neither match nor resurrect). Fresh lineage from this
            # commit's reserved row-id block: carried rows keep their
            # materialized ids, so lastRowId + file index cannot collide.
            for k, r in src_by_key.items():
                if k in matched_keys:
                    continue
                for f2 in schema["fields"]:
                    out_cols[f"f{f2['id']}"].append(r.get(f2["name"]))
                out_rid.append(meta["lastRowId"] + len(out_rid))
                out_lseq.append(seq)
                n_rows += 1
        rel_data_dir = f"data/s{snap_id}-{tag}"
        os.makedirs(os.path.join(loc, rel_data_dir), exist_ok=True)
        rel_file = f"{rel_data_dir}/part-00000-ext.parquet"
        arrays, stats = {}, {}
        for fld in schema["fields"]:
            phys = f"f{fld['id']}"
            arrays[phys] = pa.array(out_cols[phys],
                                    type=ARROW_TYPES[fld["dtype"]])
            mn, mx = stat_str(out_cols[phys], fld["dtype"])
            stats[str(fld["id"])] = {
                "min": mn, "max": mx,
                "nullCount": sum(1 for v in out_cols[phys] if v is None)}
        arrays["_row_id"] = pa.array(out_rid, type=pa.int64())
        arrays["_last_seq"] = pa.array(out_lseq, type=pa.int64())
        pq.write_table(pa.table(arrays), os.path.join(loc, rel_file))
        entry = None
        new_entries = [{
            "path": rel_file,
            "fileType": "data",
            "specId": meta["currentSpecId"],
            "schemaId": meta["currentSchemaId"],
            "partition": {},
            "rowCount": n_rows,
            "sizeBytes": os.path.getsize(os.path.join(loc, rel_file)),
            "sequenceNumber": seq,
            "stats": {k: {kk: vv for kk, vv in v.items() if vv is not None}
                      for k, v in stats.items()},
            "eqFieldIds": [],
            # lineage is materialized per row; the block id mirrors the
            # native commit's unconditional assignment
            "firstRowId": meta["lastRowId"],
            "nameMapped": False,
        }]
        # FORMAT.md segment rule: untouched segments carried BY REFERENCE,
        # dirty segments rewritten as ONE merged survivor segment. An
        # entry leaves the manifests when its data file was rewritten OR
        # its overlay was fully consumed by the rewrite.
        keep_ov = overlay_keep_paths(loc, flat, affected, ov_targets)

        def gone(e):
            return (e["path"] in affected if e["fileType"] == "data"
                    else e["path"] not in keep_ov)
        carried, survivors = [], []
        for s, es in seg_entries:
            if any(gone(e) for e in es):
                survivors += [e for e in es if not gone(e)]
            else:
                carried.append(s)
        n_dropped_ov = sum(1 for e in flat if e["fileType"] != "data"
                           and e["path"] not in keep_ov)
        operation = "overwrite"
        summary = {
            "added-data-files": "1",
            "added-delete-files": "0",
            "added-records": str(n_rows),
            # truthful added+removed counts: scanIncremental's rewrite
            # gate depends on them (round-8 amendment); consumed overlay
            # entries count among the removed files
            "removed-files": str(len(affected) + n_dropped_ov),
            "removed-records": str(removed_records),
        }
        new_last_row_id = meta["lastRowId"] + n_rows
    elif eq_col is not None:
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

    # --- manifest segments: FileMeta JSONL lines, atomic rename ------------
    # additive commits carry every parent segment by reference and add one
    # fresh segment; the CoW update also rewrites dirty segments' survivors
    if entry is not None:
        new_entries = [entry]
    if carried is None:
        carried = parent_snap["manifests"] if parent_snap else []
    os.makedirs(os.path.join(loc, "manifests"), exist_ok=True)

    def write_seg(kind, entries):
        seg_name = f"{snap_id}-{kind}-{tag}.jsonl"
        seg_rel = f"manifests/{seg_name}"
        tmp_seg = os.path.join(loc, "manifests", f".{seg_name}.tmp")
        with open(tmp_seg, "w") as f:
            f.write("\n".join(json.dumps(e) for e in entries))
        os.rename(tmp_seg, os.path.join(loc, seg_rel))
        return seg_rel

    segs = list(carried)
    if survivors:
        segs.append(write_seg("r", survivors))
    if new_entries:
        segs.append(write_seg("a", new_entries))

    # --- new snapshot + table state ----------------------------------------
    snapshot = {
        "snapshotId": snap_id,
        "sequenceNumber": seq,
        "timestampMs": int(time.time() * 1000),
        "operation": operation,
        "schemaId": meta["currentSchemaId"],
        "manifests": segs,
        "summary": summary,
    }
    if parent is not None:
        snapshot["parentId"] = parent

    meta["lastSnapshotId"] = snap_id
    meta["lastSequenceNumber"] = seq
    meta["lastRowId"] = new_last_row_id
    meta["snapshots"] = meta["snapshots"] + [snapshot]
    meta["refs"] = dict(meta["refs"])
    meta["refs"][branch] = {"snapshotId": snap_id, "isBranch": True}

    # --- CAS publish: tmp write, hard-link create-new ----------------------
    cas_publish(loc, meta, base_v, tag)
    print(f"committed snapshot {snap_id} (seq {seq}) as v{base_v + 1:05d}")


if __name__ == "__main__":
    main()
