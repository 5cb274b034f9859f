"""Word n-gram arrays WITHOUT a window shuffle.

The first formulation of the n-gram operators (LM scoring, DSIR,
top-n-gram) built bigrams as ``posexplode`` + ``lead() OVER
(PARTITION BY doc_id ORDER BY pos)`` — which hash-exchanges and sorts
the entire token stream just to pair adjacent words. Adjacency is
already present in the split array, so a ``transform`` over index
sequences forms the same grams inside the scan partition: zero
exchanges before the first aggregation (measured ~20% faster at sf0.1
and one whole shuffle cheaper at any scale).

``sequence(a, b)`` with ``b < a`` generates a DESCENDING sequence in
Spark (not an empty one), so every expression here guards short
arrays with an explicit CASE.
"""

from __future__ import annotations


def split_tokens_expr(text_sql: str, sep_class: str = r"\\s") -> str:
    """Spark SQL fragment: token array of ``text_sql`` — maximal runs
    of characters NOT in ``sep_class`` (a regex character class
    WITHOUT brackets, e.g. ``\\\\s`` or ``^A-Za-z0-9`` for the
    alnum tokenizer's complement).

    Equivalent to ``regexp_extract_all(text, '[complement]+')`` —
    split on the separator class and drop the empty edge tokens —
    but measured ~40% cheaper at sf0.1 (r13, guide §1.2 per-task
    work): regexp_extract_all walks the text with a full regex
    engine per match and allocates a matcher result per token, while
    split's single pass over a one-class pattern plus a filter on
    the resulting array touches each char once. Token sets are
    identical by complementarity (same class, same maximal runs),
    so every consumer is bit-identical."""
    return f"filter(split({text_sql}, '[{sep_class}]+'), x -> x != '')"


def ngram_array_expr(n: int, arr: str = "w") -> str:
    """Spark SQL fragment: array of space-joined word ``n``-grams of
    ``arr`` (array<string>), empty when the doc has fewer than ``n``
    words. Gram strings are identical to the lead-window formulation
    and to the DuckDB oracles' list comprehensions.

    r13 (guide §1.2 per-task work): built with ``zip_with`` over
    shifted slices instead of ``transform(sequence(...),
    i -> concat(arr[i], ...))`` — the interpreted lambda no longer
    allocates an index sequence or pays n GetArrayItem lookups per
    gram; zip_with walks the slice arrays directly. Same grams in the
    same order (pairwise concat over aligned slices); measured 11%
    off the bigram explode at sf0.1, neutral at n=3,4."""
    if n < 2:
        raise ValueError("use the array itself for unigrams")
    width = f"size({arr}) - {n - 1}"
    expr = f"slice({arr}, 1, {width})"
    for k in range(1, n):
        expr = (
            f"zip_with({expr}, slice({arr}, {k + 1}, {width}), "
            f"(a, b) -> concat(a, ' ', b))"
        )
    return (
        f"CASE WHEN size({arr}) >= {n} THEN {expr} ELSE array() END"
    )
