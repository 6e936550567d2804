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

Text mutation (--mutate-text, VERDICT r9 item 5): the base generator emits
ASCII-ish prose, so Java-vs-RE2 character-class divergences sit latent — the
\\x0B class (Java \\s includes vertical tab, RE2's does not) survived 7
rounds until a code audit found it, because no fuzz clone ever CONTAINED a
vertical tab. This mode splices hostile codepoints into documents.text at
seeded positions: vertical tab/form feed, NBSP/thin/ideographic spaces,
zero-width space/joiner/ZWNBSP, a combining accent, U+FFFD, and astral-plane
(surrogate-pair in UTF-16 engines) codepoints — then the text-family
registry sweep on the clone decides whether both engines still agree.

Usage:
    python tools/fuzz_parity.py <out_dir> [seed] [src_sf_dir] [--mutate-text]
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


# Hostile codepoints, one per divergence class: Java-vs-RE2 \s members,
# unicode spaces outside BOTH engines' \s, zero-widths (length vs token
# boundary), a combining sequence (grapheme vs codepoint counting), the
# replacement char (encoding-audit fodder), and astral-plane codepoints
# (UTF-16 length 2 in Java, 1 codepoint in DuckDB — any length() disparity
# shows here).
_TEXT_MUTATIONS = [
    "\x0b",        # vertical tab: Java \\s yes, RE2 \\s no (the r9 class)
    "\x0c",        # form feed: in both \\s classes
    "\u00a0",      # NBSP
    "\u2009",      # thin space
    "\u3000",      # ideographic space
    "\u200b",      # zero-width space
    "\u200d",      # zero-width joiner
    "\ufeff",      # ZWNBSP / BOM-as-content
    "e\u0301",     # combining acute (grapheme of 2 codepoints)
    "\ufffd",      # replacement character
    "\U0001f600",  # astral: emoji (UTF-16 surrogate pair)
    "\U00010348",  # astral: Gothic letter
]


def _mutate_text_array(col: pa.ChunkedArray, rng) -> pa.Array:
    """Splice 1-3 hostile codepoints into ~30% of strings at seeded
    positions. Insertion (never replacement) so every original token
    survives — a mutation can only ADD boundary cases, making any
    divergence attributable to the injected codepoint."""
    texts = col.to_pylist()
    out = []
    for s in texts:
        if s is None or rng.random() > 0.30:
            out.append(s)
            continue
        for _ in range(int(rng.integers(1, 4))):
            m = _TEXT_MUTATIONS[int(rng.integers(0, len(_TEXT_MUTATIONS)))]
            pos = int(rng.integers(0, len(s) + 1)) if s else 0
            s = s[:pos] + m + s[pos:]
        out.append(s)
    return pa.array(out, type=pa.string())


def _perturb_table(
    src: str, dst: str, table: str, seed: int, mutate_text: bool = False
) -> None:
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
    if mutate_text and table == "documents":
        # separate seeded stream so non-mutated clones of the same seed stay
        # byte-identical to pre-r10 runs
        trng = np.random.default_rng([seed, zlib.crc32(table.encode()), 0x7E47])
        cols["text"] = _mutate_text_array(t.column("text"), trng)
    out = pa.table(cols)
    pq.write_table(out, os.path.join(dst, f"{table}.parquet"))


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    args = [a for a in sys.argv[1:] if a != "--mutate-text"]
    mutate_text = "--mutate-text" in sys.argv
    out_dir = args[0]
    seed = int(args[1]) if len(args) > 1 else 1
    src = args[2] if len(args) > 2 else "/root/testdata/sf0.01"
    os.makedirs(out_dir, exist_ok=True)
    for table in TABLES:
        _perturb_table(src, out_dir, table, seed, mutate_text=mutate_text)
    print(
        f"perturbed clone of {src} (seed={seed}"
        f"{', text-mutated' if mutate_text else ''}) -> {out_dir}"
    )


if __name__ == "__main__":
    main()
