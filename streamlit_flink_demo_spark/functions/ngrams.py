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


def ngram_array_expr(n: int, arr: str = "w") -> str:
    """Spark SQL fragment: array of space-joined word ``n``-grams of
    ``arr`` (array<string>), empty when the doc has fewer than ``n``
    words. Gram strings are identical to the lead-window formulation
    and to the DuckDB oracles' list comprehensions."""
    if n < 2:
        raise ValueError("use the array itself for unigrams")
    parts = ", ' ', ".join(f"{arr}[i+{k}]" for k in range(n))
    return (
        f"CASE WHEN size({arr}) >= {n} THEN "
        f"transform(sequence(0, size({arr}) - {n}), i -> concat({parts})) "
        f"ELSE array() END"
    )
