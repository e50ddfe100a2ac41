#!/usr/bin/env python3
"""Derived scale points for the round-15 dedup/ANN scaling-slope probe
(VERDICT r14 item 6). The driver ships sf{0.001,0.01,0.1}; the probe
needs points ABOVE and BELOW sf0.1 to see a quadratic term the page
cache hides at one scale:
  sf0.05 = deterministic half of sf0.1 (doc_id/vec_id even),
  sf0.2  = sf0.1 plus a MIRROR copy — ids offset, text REVERSED
           (same length/char distribution, entirely different shingle
           values: no artificial cross-copy near-dups, so the dup/LSH
           candidate structure scales like real data, not like an
           every-doc-duplicated corpus), embeddings NEGATED (same
           norms; cosine top-k structure mirrors within the copy).
Other tables symlink to sf0.1 — the probe queries read only
documents/embeddings; symlinks keep the dirs complete for warm-up.
Usage: scaleprobe_gen.py <outroot>   (writes <outroot>/sf0.05, sf0.2)
"""
import os, sys
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

def link_rest(d):
    for f in os.listdir(SRC):
        dst = os.path.join(d, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f), dst)

def scale_write_tables(half, dbl):
    """Round-16 write-family legs (VERDICT r15 item 3): the write/
    maintenance keys read orders (q_update_cow, q_merge_upsert,
    q_compaction, q_cdc_apply) and events (q_overwrite_partitions).
    sf0.05 = even primary keys; sf0.2 = original + mirror with offset
    keys (modular predicate classes keep their hit fraction, so the
    affected-row volume scales with the table). The events mirror also
    shifts ts by +366 days: partition/file count doubles with the
    table, which is exactly the axis an O(table-files) commit term
    would show up on (the overwrite patch itself stays one day — its
    commit should be near-FLAT if touched-partition commits hold)."""
    # link_rest may already have symlinked these names into the scale dirs;
    # writing through a symlink would clobber the READ-ONLY source tree
    for d in (half, dbl):
        for f in ("orders.parquet", "events.parquet"):
            p = os.path.join(d, f)
            if os.path.islink(p):
                os.unlink(p)
    off = 10_000_000
    orders = pq.read_table(os.path.join(SRC, "orders.parquet"))
    events = pq.read_table(os.path.join(SRC, "events.parquet"))

    okeys = orders.column("o_orderkey").to_pylist()
    keep = [i for i, v in enumerate(okeys) if v % 2 == 0]
    pq.write_table(orders.take(pa.array(keep, pa.int64())),
                   os.path.join(half, "orders.parquet"))
    o2 = orders.set_column(0, "o_orderkey",
                           pa.array([v + off for v in okeys], pa.int64()))
    pq.write_table(pa.concat_tables([orders, o2]),
                   os.path.join(dbl, "orders.parquet"))

    ekeys = events.column("event_id").to_pylist()
    keepe = [i for i, v in enumerate(ekeys) if v % 2 == 0]
    pq.write_table(events.take(pa.array(keepe, pa.int64())),
                   os.path.join(half, "events.parquet"))
    yr = 366 * 24 * 3600 * 1_000_000  # timestamp[us]
    e2 = events.set_column(0, "event_id",
                           pa.array([v + off for v in ekeys], pa.int64()))
    e2 = e2.set_column(1, "ts", pa.array(
        [v + yr for v in events.column("ts").cast(pa.int64()).to_pylist()],
        pa.int64()).cast(pa.timestamp("us")))
    pq.write_table(pa.concat_tables([events, e2]),
                   os.path.join(dbl, "events.parquet"))


def main(root):
    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    embs = pq.read_table(os.path.join(SRC, "embeddings.parquet"))

    half = os.path.join(root, "sf0.05")
    os.makedirs(half, exist_ok=True)
    ids = docs.column("doc_id").to_pylist()
    keep = [i for i, v in enumerate(ids) if v % 2 == 0]
    pq.write_table(docs.take(pa.array(keep, pa.int64())),
                   os.path.join(half, "documents.parquet"))
    vids = embs.column("vec_id").to_pylist()
    keepv = [i for i, v in enumerate(vids) if v % 2 == 0]
    pq.write_table(embs.take(pa.array(keepv, pa.int64())),
                   os.path.join(half, "embeddings.parquet"))
    link_rest(half)

    dbl = os.path.join(root, "sf0.2")
    os.makedirs(dbl, exist_ok=True)
    off = 10_000_000
    d2 = pa.table({
        "doc_id": pa.array([v + off for v in ids], pa.int64()),
        "text": pa.array([t[::-1] for t in docs.column("text").to_pylist()],
                         pa.string()),
        "lang": docs.column("lang"),
        "source": docs.column("source"),
        "n_chars": docs.column("n_chars"),
    })
    pq.write_table(pa.concat_tables([docs.select(d2.column_names), d2]),
                   os.path.join(dbl, "documents.parquet"))
    e2 = pa.table({
        "vec_id": pa.array([v + off for v in vids], pa.int64()),
        "embedding": pa.array(
            [[-x for x in row] for row in embs.column("embedding").to_pylist()],
            pa.list_(pa.float32())),
        "label": embs.column("label"),
    })
    pq.write_table(pa.concat_tables([embs.select(e2.column_names), e2]),
                   os.path.join(dbl, "embeddings.parquet"))
    scale_write_tables(half, dbl)
    link_rest(dbl)
    print(f"scaleprobe: wrote {half} ({len(keep)} docs) and {dbl} "
          f"({docs.num_rows * 2} docs)")

if __name__ == "__main__":
    main(sys.argv[1])
