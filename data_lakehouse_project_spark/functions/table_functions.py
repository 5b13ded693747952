"""Python user-defined table functions (UDTF) — the row→rows extension
point of the SQL surface (Spark 3.5+).

A UDTF is the escape hatch for generators that genuinely can't be
expressed with explode/posexplode over JVM arrays — e.g. streaming
tokenizers with carried state, external-library record splitters,
windowed parsers. It IS row-at-a-time Python, so the engine's rule is:
use the JVM path (``F.transform``/``explode``) when expressible — see
``registry.text_top_bigrams`` for the JVM twin of this module's demo —
and reach for a UDTF only at API boundaries that need imperative Python.

The demo UDTF emits positional n-grams; its oracle is a DuckDB lateral
``generate_series`` join, so the driver hash-checks the Python generator
against pure SQL.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="ngram: string, pos: int")
class NGramsUDTF:
    """Yield (space-joined n-gram, 0-based position) per input row."""

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None or n is None or n < 1:
            return
        toks = text.split()
        for i in range(len(toks) - n + 1):
            yield (" ".join(toks[i : i + n]), i)


def register_table_functions(spark) -> None:
    """Idempotently register all engine UDTFs on the session."""
    spark.udtf.register("ngrams", NGramsUDTF)
