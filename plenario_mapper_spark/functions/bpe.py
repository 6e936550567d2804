"""Exact byte-pair-encoding tokenization as JVM-side expressions.

The reference surface (app/mapper.js has no tokenizer; this is §2.H
training-data-pipeline scope, VERDICT r12 item 2) needs BPE in two forms:

1. TRAIN — learn a merge table from the corpus (operators/tokenizer.py:
   the iterative pair-count -> argmax -> fuse loop over the DISTINCT-WORD
   relation, the form that scales: a 100 TB corpus with a 10M-word
   vocabulary pays O(vocab) per merge round, never O(corpus)).
2. APPLY — tokenize against a COMMITTED merge table (this module): the
   trained tokenizer is an artifact applied identically forever, so exact
   token counts (sequence packing budgets, context-window fits) are
   reproducible by any engine — which is exactly what the oracle proves.

Representation: a word's symbol sequence is one string
``@sym@@sym@@sym@`` — every symbol wrapped in ``@`` (symbols are
``[a-z0-9_]+`` from functions.text.tokens, so ``@`` never collides).
Applying merge (l, r) is then the literal string replacement
``@l@@r@ -> @lr@``: the doubled delimiter donates one ``@`` to each
neighbor, so left-to-right non-overlapping replacement reproduces the
Sennrich merge pass exactly (``a a a`` + (a,a) -> ``aa a``), entirely
inside whole-stage codegen — no UDF, no Python. DuckDB's replace() has
identical left-to-right semantics, making every step oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# The committed tokenizer artifact: 16 merges trained by
# operators/tokenizer.bpe_train on the sf0.01 documents corpus (weighting
# each distinct word by its corpus count, words of length >= 2, tie-break
# highest-count then lexicographic (left, right)). Rank order IS the
# application order. q_vocab_bpe_train re-derives the same table against
# the live corpus; this frozen copy is what APPLY-side queries use, the
# way a production pipeline ships tokenizer.json.
COMMITTED_MERGES: list[tuple[str, str]] = [
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),
    ("a", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    ("j", "o"),
    ("jo", "in"),
    ("a", "s"),
    ("as", "h"),
    ("h", "ash"),
    ("r", "ow"),
]


def char_seq(word: Column) -> Column:
    """``word -> '@c@@h@@a@@r@'`` — the initial (all-characters) symbol
    sequence. Pure expression: substr per position, joined with the doubled
    delimiter."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )
    return F.concat(F.lit("@"), F.array_join(chars, "@@"), F.lit("@"))


def apply_merge(seq: Column, left: Column | str, right: Column | str) -> Column:
    """One merge pass over a symbol sequence (left-to-right, non-overlapping
    — the delimiter trick makes plain replace() exactly that)."""
    l = F.lit(left) if isinstance(left, str) else left
    r = F.lit(right) if isinstance(right, str) else right
    return F.replace(
        seq,
        F.concat(F.lit("@"), l, F.lit("@@"), r, F.lit("@")),
        F.concat(F.lit("@"), l, r, F.lit("@")),
    )


def apply_merges(seq: Column, merges: list[tuple[str, str]]) -> Column:
    """Fold a committed merge table over a sequence in rank order — one
    nested literal-replace expression, fully JVM-side."""
    for l, r in merges:
        seq = apply_merge(seq, l, r)
    return seq


def symbols(seq: Column) -> Column:
    """Decode a sequence string back to its symbol array."""
    return F.split(F.btrim(seq, F.lit("@")), "@@")


def token_count(seq: Column) -> Column:
    """Number of BPE tokens in a (merged) sequence."""
    return F.size(symbols(seq))


def sql_char_seq(word_expr: str) -> str:
    """DuckDB mirror of char_seq for oracle generation."""
    return (
        "('@' || array_to_string([substring(" + word_expr + ", i, 1) "
        "FOR i IN generate_series(1, length(" + word_expr + "))], '@@') || '@')"
    )


def sql_apply_merges(seq_expr: str, merges: list[tuple[str, str]]) -> str:
    """DuckDB mirror of apply_merges: nested literal replace() calls in rank
    order (identical left-to-right semantics)."""
    out = seq_expr
    for l, r in merges:
        out = f"replace({out}, '@{l}@@{r}@', '@{l}{r}@')"
    return out


def sql_token_count(seq_expr: str) -> str:
    """DuckDB mirror of token_count."""
    return f"len(string_split(trim({seq_expr}, '@'), '@@'))"
