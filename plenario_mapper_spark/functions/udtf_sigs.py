"""Native Python UDTFs (SURVEY §2.G) — the table-function corner of the
declared UDF/UDAF/UDTF surface, via Spark's first-class `@udtf` API (one row
in, many typed rows out, usable standalone or as a SQL LATERAL join).

Contract note: a Python UDTF is a row-at-a-time slow path (each `eval` is an
interpreter call). The production operators keep their fast forms — chunking
is expression-based (`q_doc_chunk_windows`), frame fan-out is Arrow-batched
`mapInPandas` (`multimodal.sample_frames`) — and this module exists so the
table-function API itself is a tested, documented capability, for the cases
where per-row imperative generation is genuinely the clearest tool (config
expansion, small reference-table synthesis), not for corpus-scale hot paths.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk: string, idx: int, n_tokens: int")
class ChunkWords:
    """Split whitespace-tokenized text into fixed-size word chunks:
    ('a b c d e', 2) -> ('a b', 0, 2), ('c d', 1, 2), ('e', 2, 1).
    Empty/NULL text yields no rows (a generator, not a NULL row)."""

    def eval(self, text: str, n: int):
        toks = (text or "").split()
        step = max(int(n or 1), 1)
        for i in range(0, len(toks), step):
            piece = toks[i : i + step]
            yield " ".join(piece), i // step, len(piece)


def register_udtfs(spark) -> None:
    """Make the module's UDTFs SQL-visible (idempotent): after this,
    `SELECT ... FROM docs, LATERAL chunk_words(text, 128)` works."""
    spark.udtf.register("chunk_words", ChunkWords)
