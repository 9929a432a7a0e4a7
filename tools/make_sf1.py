"""Synthesize the sf1 scaling fixture: a deterministic ~10x re-keyed
replication of /root/testdata/sf0.1 into /root/repo/.scale/sf1/
(TESTDATA.md-style tables, multi-row-group parquet so a cold scan
splits across cores).

Design (weak scaling, TPC-H conventions):
- Fact tables (customer, orders, lineitem, events, documents,
  embeddings) are replicated 10x with DISJOINT key ranges per replica
  (replica 0 = the original rows bit-for-bit); foreign keys are
  offset consistently (orders.o_custkey follows customer, lineitem
  .l_orderkey follows orders, events.user_id gets its own range per
  replica so per-user series keep their sf0.1 shape — 10x MORE
  series, not 10x DEEPER ones).
- Dimension tables (region, nation, part, supplier) stay fixed, like
  TPC-H's region/nation: broadcast sides must remain broadcast-sized
  at every sf.
- documents.text is word-ROTATED per replica (rotation preserves
  length/charset statistics but replaces the shingle set wholesale),
  so near-dup clusters stay within a replica and dedup workloads
  scale linearly instead of creating 10-member cross-replica
  dup-cliques (a quadratic artifact no real corpus growth has).
- embeddings are dimension-rolled per replica (np.roll keeps norms
  and the label marginal; avoids 10 exact copies of every vector,
  which would tie-break ANN re-ranks pathologically).
- events.event_id offsets use 2^20 strides, deliberately NOT a
  multiple of 100000: the spatial tier derives x/y as
  event_id*{7919,104729} % 100000, so a 100000-multiple stride would
  stack every replica onto the SAME lattice points; 2^20 shifts the
  lattice per replica. Point density grows 10x on the fixed plane —
  the honest consequence of more data in the same geography.

Deterministic end to end (seeded, order-preserving); safe to re-run
(overwrites). Run: python tools/make_sf1.py
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.scale/sf1"
REPLICAS = 10

C_OFF = 1_000_000       # customer key stride
O_OFF = 10_000_000      # order key stride
EV_OFF = 1 << 20        # event id stride (not a multiple of 100000)
U_OFF = 1_000_000       # user id stride
D_OFF = 1_000_000       # doc id stride
V_OFF = 1_000_000       # vec id stride


def _write(name: str, table: pa.Table, group_rows: int) -> None:
    os.makedirs(DST, exist_ok=True)
    pq.write_table(
        table,
        f"{DST}/{name}.parquet",
        row_group_size=group_rows,
        compression="snappy",
    )
    print(f"{name}: {table.num_rows} rows, row_group_size={group_rows}")


def _offset(col: pa.ChunkedArray, off: int) -> pa.Array:
    return pa.array(col.to_numpy(zero_copy_only=False) + off, type=col.type)


def replicate(name: str, mutate) -> None:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    parts = [t]
    for i in range(1, REPLICAS):
        parts.append(mutate(t, i))
    out = pa.concat_tables(parts)
    _write(name, out, max(out.num_rows // 32, 10_000))


def main() -> None:
    # --- dimensions: copied verbatim (single row group, tiny) ---
    for name in ("region", "nation", "part", "supplier"):
        t = pq.read_table(f"{SRC}/{name}.parquet")
        _write(name, t, max(t.num_rows, 1))

    replicate(
        "customer",
        lambda t, i: t.set_column(
            t.schema.get_field_index("c_custkey"), "c_custkey",
            _offset(t["c_custkey"], i * C_OFF),
        ),
    )

    def mut_orders(t: pa.Table, i: int) -> pa.Table:
        t = t.set_column(
            t.schema.get_field_index("o_orderkey"), "o_orderkey",
            _offset(t["o_orderkey"], i * O_OFF),
        )
        return t.set_column(
            t.schema.get_field_index("o_custkey"), "o_custkey",
            _offset(t["o_custkey"], i * C_OFF),
        )

    replicate("orders", mut_orders)

    replicate(
        "lineitem",
        lambda t, i: t.set_column(
            t.schema.get_field_index("l_orderkey"), "l_orderkey",
            _offset(t["l_orderkey"], i * O_OFF),
        ),
    )

    def mut_events(t: pa.Table, i: int) -> pa.Table:
        t = t.set_column(
            t.schema.get_field_index("event_id"), "event_id",
            _offset(t["event_id"], i * EV_OFF),
        )
        return t.set_column(
            t.schema.get_field_index("user_id"), "user_id",
            _offset(t["user_id"], i * U_OFF),
        )

    replicate("events", mut_events)

    def mut_documents(t: pa.Table, i: int) -> pa.Table:
        t2 = t.set_column(
            t.schema.get_field_index("doc_id"), "doc_id",
            _offset(t["doc_id"], i * D_OFF),
        )
        texts = t2["text"].to_pylist()
        rotated = []
        for txt in texts:
            words = txt.split(" ")
            k = (i * 7) % max(len(words), 1)
            # Round-8 fix: the original word-level CYCLIC rotation
            # preserved every 3-gram shingle except the <=2 windows
            # crossing the wrap boundary (a cyclic shift permutes the
            # window set, it does not replace it), so replicas formed
            # 10-member cross-replica near-dup cliques — exactly the
            # quadratic artifact the module docstring promises to
            # avoid (measured: 505k qualifying Jaccard pairs at sf1
            # vs 2.3k at sf0.1, 218x for 10x docs, which inflated
            # every dedup-tier scaling row). Char-rotating each WORD
            # by the replica index keeps length and charset
            # statistics bit-for-bit but changes almost every token,
            # which destroys the shingle set wholesale; replica 0
            # stays the original rows (r = k = 0).
            # Round-9 ADVICE fix: rotating by (i % len(w)) is the
            # IDENTITY whenever len(w) divides i (all 1/2/4-char words
            # at replica 4, 5-char words at replica 5, ...), so common
            # short words survived unchanged and some cross-replica
            # 3-gram shingles persisted. Rotate by 1 + (i % (len-1))
            # instead: the offset is always in [1, len-1], so EVERY
            # word of length >= 2 is perturbed at EVERY replica index
            # (length-1 words have no non-identity rotation).
            if i > 0:
                words = [
                    w[1 + (i % (len(w) - 1)):] + w[:1 + (i % (len(w) - 1))]
                    if len(w) >= 2 else w
                    for w in words
                ]
            rotated.append(" ".join(words[k:] + words[:k]))
        t2 = t2.set_column(
            t2.schema.get_field_index("text"), "text",
            pa.array(rotated, type=pa.string()),
        )
        return t2.set_column(
            t2.schema.get_field_index("n_chars"), "n_chars",
            pa.array([len(s) for s in rotated], type=pa.int64()),
        )

    replicate("documents", mut_documents)

    def mut_embeddings(t: pa.Table, i: int) -> pa.Table:
        t2 = t.set_column(
            t.schema.get_field_index("vec_id"), "vec_id",
            _offset(t["vec_id"], i * V_OFF),
        )
        vecs = np.array(t2["embedding"].to_pylist(), dtype=np.float32)
        rolled = np.roll(vecs, i, axis=1)
        return t2.set_column(
            t2.schema.get_field_index("embedding"), "embedding",
            pa.array([row.tolist() for row in rolled],
                     type=pa.list_(pa.float32())),
        )

    replicate("embeddings", mut_embeddings)


if __name__ == "__main__":
    main()
