"""Synthesize an sf1-shaped benchmark dataset from the read-only sf0.1 tables.

Purpose (VERDICT r4 item 6): one honest data-proportional scaling datapoint.
The driver's sf0.1 parquet is a SINGLE row group per table, which caps Spark's
scan parallelism at 1 task (PERF_NOTES root cause for the r1->r3 inflation);
this tool both (a) scales the facts 10x and (b) writes multi-file parquet, so
the sf1 run measures the engine's real parallel shape.

Method: stack REPLICAS key-shifted copies of each fact/stream table — every
foreign key shifts by the same per-copy offset, so join selectivities, group
cardinalities (x10 groups where the key participates), and per-key row counts
are preserved exactly; dimensions (region/nation/customer/supplier/part) stay
at their original cardinality EXCEPT customer/part/supplier keys referenced by
shifted facts, which are replicated with the same shift (TPC-H scales those
with sf too, so this matches the spec's shape). Dates/values are untouched.

documents.text is additionally made REPLICA-DISJOINT (r13): replica r>0 has
its letters caesar-shifted by r%25+1 (token lengths, counts, and structure
identical; digits/punctuation untouched; replica 0 verbatim). Verbatim copies
made every doc a member of a REPLICAS-sized exact-duplicate cluster, so any
text-similarity workload saw candidate-pair growth quadratic in REPLICAS by
construction (the x100 clone put ~25 billion pairs through the jaccard path
and died on spill) — measuring the testdata artifact, not the engine. The
shift keeps each replica an internally-identical corpus in a disjoint
"alphabet", the same disjointness contract the key shift gives the joins.

Usage: python tools/gen_sf1.py [out_dir]   (default .bench_data/sf1, gitignored)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SRC_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("REPLICAS", "10"))
ROW_GROUP = 128 * 1024  # rows per row group: restores scan parallelism

# per-table key columns that shift by (copy_index * stride); stride is the
# max over copies of (max_key + 1) so shifted ranges never collide
SHIFT_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation"]


def main() -> None:
    out_root = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_data", "sf1",
    )
    os.makedirs(out_root, exist_ok=True)

    strides: dict[str, int] = {}
    for t, keys in SHIFT_KEYS.items():
        tab = pq.read_table(os.path.join(SRC, f"{t}.parquet"), columns=keys)
        for k in keys:
            mx = pa.compute.max(tab[k]).as_py() or 0
            strides[k] = max(strides.get(k, 0), int(mx) + 1)
    # keys that must shift in lockstep across tables share one stride
    for pair in (("o_orderkey", "l_orderkey"), ("o_custkey", "c_custkey"),
                 ("l_partkey", "p_partkey"), ("l_suppkey", "s_suppkey")):
        m = max(strides[pair[0]], strides[pair[1]])
        strides[pair[0]] = strides[pair[1]] = m

    for t in COPY_ONLY:
        tab = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        pq.write_table(tab, os.path.join(out_root, f"{t}.parquet"))
        print(f"{t}: copied ({tab.num_rows} rows)")

    for t, keys in SHIFT_KEYS.items():
        src = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        out_dir = os.path.join(out_root, f"{t}.parquet")
        os.makedirs(out_dir, exist_ok=True)
        for r in range(REPLICAS):
            cols = {}
            for name in src.column_names:
                col = src[name]
                if name in keys and r > 0:
                    col = pa.compute.add(col, r * strides[name])
                elif t == "documents" and name == "text" and r > 0:
                    shift = r % 25 + 1
                    lower = "abcdefghijklmnopqrstuvwxyz"
                    upper = lower.upper()
                    tbl = str.maketrans(
                        lower + upper,
                        lower[shift:] + lower[:shift]
                        + upper[shift:] + upper[:shift],
                    )
                    col = pa.array(
                        [None if s is None else s.translate(tbl)
                         for s in col.to_pylist()],
                        type=pa.string(),
                    )
                cols[name] = col
            shifted = pa.table(cols, schema=None).cast(src.schema)
            pq.write_table(
                shifted,
                os.path.join(out_dir, f"part-{r:02d}.parquet"),
                row_group_size=ROW_GROUP,
            )
        print(f"{t}: {REPLICAS}x{src.num_rows} rows, {REPLICAS} files")
    print(f"wrote {out_root}")


if __name__ == "__main__":
    main()
