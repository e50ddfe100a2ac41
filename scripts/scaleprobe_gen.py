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
    link_rest(dbl)
    print(f"scaleprobe: wrote {half} ({len(keep)} docs) and {dbl} "
          f"({docs.num_rows * 2} docs)")

if __name__ == "__main__":
    main(sys.argv[1])
