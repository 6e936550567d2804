"""Parity fuzz: re-run oracle queries on PERTURBED clones of the testdata.

Why: the driver regenerates /root/testdata between rounds, so a query that is
t2-MATCH today can still red a future CORRECTNESS window if its cross-engine
parity is DATA-dependent — a rounding-boundary straddle, a top-k tie, a
float-sum ordering that only bites on particular values. This tool
manufactures that future: clone the sf tables with seeded perturbations
(row drops, small multiplicative noise on every float column, timestamp
jitter), then point tools/t2.py at the clone. Engine and oracle read the
SAME perturbed parquet, so any MISMATCH is a genuine latent parity flake,
found here instead of in a driver round.

Perturbations (seeded, deterministic per (table, seed)):
- drop ~15% of rows (new group sizes, new tie configurations);
- float64 columns: multiply by (1 + U(-5e-6, 5e-6)) and add U(-5e-5, 5e-5)
  (new rounding neighborhoods near every .5e-6 boundary);
- float32 list columns (embeddings): same multiplicative noise;
- timestamp columns: jitter by U(-3600, 3600) seconds at native resolution
  (new window/session boundaries);
- keys, ints, strings: untouched (join topology and text analytics keep
  their shape); region/nation are copied verbatim (5/25 rows — dropping
  them would vacuously empty joins rather than stress parity); columns
  carrying NULLs are copied verbatim (perturbation would rewrite the null
  mask into NaN/empty, manufacturing false flakes and masking real
  NULL-handling ones).

First full sweep earned its keep: found the add_months time-of-day
truncation in q_scalar_calendar and the hard-coded group size in
q_binary_phash_dedup's oracle (both fixed in r8).

Usage:
    python tools/fuzz_parity.py <out_dir> [seed] [src_sf_dir]
    SF=<out_dir> python tools/t2.py <query...>
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
VERBATIM = {"region", "nation"}


def _perturb_table(src: str, dst: str, table: str, seed: int) -> None:
    import zlib

    t = pq.read_table(os.path.join(src, f"{table}.parquet"))
    if table in VERBATIM:
        pq.write_table(t, os.path.join(dst, f"{table}.parquet"))
        return
    # crc32, NOT hash(): Python's str hash is salted per process, which
    # would make "the same seed" produce a different clone every run and
    # any mismatch unreproducible
    rng = np.random.default_rng([seed, zlib.crc32(table.encode())])
    keep = rng.random(t.num_rows) > 0.15
    t = t.filter(pa.array(keep))
    cols = {}
    for name in t.column_names:
        col = t.column(name)
        typ = col.type
        if col.null_count:
            # perturbing would erase the null mask (to_numpy -> NaN for
            # floats, from_arrays drops list validity) — rewriting NULL
            # topology both manufactures false flakes (NaN semantics) and
            # masks real NULL-handling ones; leave such columns verbatim
            cols[name] = col
        elif pa.types.is_float64(typ):
            v = col.to_numpy(zero_copy_only=False)
            noise = 1.0 + (rng.random(len(v)) - 0.5) * 1e-5
            off = (rng.random(len(v)) - 0.5) * 1e-4
            cols[name] = pa.array(v * noise + off, type=typ)
        elif pa.types.is_timestamp(typ):
            unit = typ.unit
            per_sec = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
            v = col.combine_chunks().cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            jit = rng.integers(-3600, 3601, size=len(v)) * per_sec
            cols[name] = pa.array(v + jit, type=pa.int64()).cast(typ)
        elif pa.types.is_list(typ) and pa.types.is_float32(typ.value_type):
            chunk = col.combine_chunks()
            flat = chunk.flatten().to_numpy(zero_copy_only=False)
            noise = (1.0 + (rng.random(len(flat)) - 0.5) * 1e-5).astype(
                np.float32
            )
            cols[name] = pa.ListArray.from_arrays(
                chunk.offsets, pa.array(flat * noise, type=pa.float32())
            )
        else:
            cols[name] = col
    out = pa.table(cols)
    pq.write_table(out, os.path.join(dst, f"{table}.parquet"))


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    out_dir = sys.argv[1]
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    os.makedirs(out_dir, exist_ok=True)
    for table in TABLES:
        _perturb_table(src, out_dir, table, seed)
    print(f"perturbed clone of {src} (seed={seed}) -> {out_dir}")


if __name__ == "__main__":
    main()
