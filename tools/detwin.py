#!/usr/bin/env python3
"""De-twinned N-times stress dir for the PAIR-GENERATING families.

stress5x's plain twin copy duplicates documents/embeddings content
verbatim, so near-dup operators (minhash bands, winnowing, embedding
cosine, fuzzy join) see every copy as a near-dup of every other copy —
output grows quadratically BY CONSTRUCTION and time measurements say
nothing about the operators' real scaling. This builder keeps the
key-offset referential copy for every table but PERTURBS the copied
content so cross-copy pairs stop being near-dups:

- documents: in copy c >= 1, every 4th word is replaced by a
  copy-specific token (zq<c>x<i%97>) and n_chars is recomputed. Exact
  in-copy duplicates stay exact (identical perturbation), in-copy
  near-dups stay near (same positional rule), but two copies of one
  document now differ in 25% of words, capping clean runs at 3 tokens
  — below the winnowing guarantee (k+w-1 = 6 shared tokens force a
  shared fingerprint) and short enough that 3-gram shingle Jaccard
  across copies falls to ~0.14 << the 0.8 near-dup threshold, so
  banded-minhash / winnowing / substring-gram collisions across copies
  vanish (an 8-word cadence left 7-token clean runs and 957k cross-copy
  winnow pairs at 25x).
- embeddings: copy c's vectors are circularly shifted by (7*c) % dim
  components. A coordinate permutation is orthogonal, so ALL
  within-copy cosines are preserved exactly, while cross-copy cosines
  fall to chance (<< any near-dup threshold).
- customer: copy c's names get the suffix x<c> (>= 2 edits between any
  two copies of one name, so edit-distance-<=1 fuzzy joins stop
  pairing copies; within-copy distances are unchanged because every
  name in a copy carries the same suffix).

Deterministic, engine-agnostic (both Spark and the DuckDB oracle read
the same perturbed parquet), and referentially consistent with the
other twinned tables.

Usage: python3 tools/detwin.py <src_sf_dir> <dst_dir> [copies]
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq

import stress5x

B = stress5x.B


def perturb_text(text, c):
    if text is None or c == 0:
        return text
    words = text.split(" ")
    for i in range(0, len(words), 4):
        words[i] = f"zq{c}x{i % 97}"
    return " ".join(words)


def _documents(src_dir, dst, copies):
    t = pq.read_table(f"{src_dir}/documents.parquet")
    cols = {name: t[name].to_pylist() for name in t.column_names}
    n = t.num_rows
    out = {name: [] for name in t.column_names}
    for c in range(copies):
        for i in range(n):
            txt = perturb_text(cols["text"][i], c)
            out["doc_id"].append(cols["doc_id"][i] + c * B)
            out["text"].append(txt)
            out["lang"].append(cols["lang"][i])
            out["source"].append(cols["source"][i])
            out["n_chars"].append(len(txt) if txt is not None else None)
    pq.write_table(pa.table(
        {name: pa.array(out[name], type=t.schema.field(name).type)
         for name in t.column_names}, schema=t.schema), dst)


def _embeddings(src_dir, dst, copies):
    t = pq.read_table(f"{src_dir}/embeddings.parquet")
    cols = {name: t[name].to_pylist() for name in t.column_names}
    n = t.num_rows
    out = {name: [] for name in t.column_names}
    for c in range(copies):
        for i in range(n):
            v = cols["embedding"][i]
            if v is not None and c > 0:
                k = (7 * c) % len(v)
                v = v[k:] + v[:k]
            out["vec_id"].append(cols["vec_id"][i] + c * B)
            out["embedding"].append(v)
            out["label"].append(cols["label"][i])
    pq.write_table(pa.table(
        {name: pa.array(out[name], type=t.schema.field(name).type)
         for name in t.column_names}, schema=t.schema), dst)


def _customer_names(dst_dir):
    import duckdb
    con = duckdb.connect()
    p = f"{dst_dir}/customer.parquet"
    tmp = p + ".detwin"
    con.sql(f"""COPY (SELECT * REPLACE (
        CASE WHEN c_custkey >= {B}
             THEN c_name || 'x' || CAST(c_custkey // {B} AS VARCHAR)
             ELSE c_name END AS c_name)
      FROM '{p}') TO '{tmp}' (FORMAT PARQUET)""")
    import os
    os.replace(tmp, p)


def build(src_dir, dst_dir, copies):
    """Twin-copy every table, then overwrite documents / embeddings /
    customer names with the de-twinned (content-perturbed) versions."""
    stress5x.build(src_dir, dst_dir, copies)
    _documents(src_dir, f"{dst_dir}/documents.parquet", copies)
    _embeddings(src_dir, f"{dst_dir}/embeddings.parquet", copies)
    _customer_names(dst_dir)
    print(f"de-twinned documents/embeddings/customer across {copies} copies")


if __name__ == "__main__":
    build(sys.argv[1], sys.argv[2],
          int(sys.argv[3]) if len(sys.argv) > 3 else 25)
