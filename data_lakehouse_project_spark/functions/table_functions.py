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
    spark.udtf.register("split_fields", SplitFieldsUDTF)


# ---------------------------------------------------------------------
# Polymorphic UDTF (Spark 4): the output SCHEMA is computed at plan
# time by a static ``analyze`` over the call's constant arguments —
# the API for generic record splitters whose shape depends on how
# they're called (spark.apache.org UDTF docs; no fixed returnType).
# ---------------------------------------------------------------------

from pyspark.sql.functions import udtf as _udtf_poly
from pyspark.sql.types import StringType, StructType


@_udtf_poly
class SplitFieldsUDTF:
    """``split_fields(value, 'col1,col2,...', sep)`` — split a
    delimited string into NAMED columns; the column list is a constant
    argument resolved by ``analyze`` at plan time. Missing trailing
    fields yield nulls; extra fields are dropped (fixed arity is the
    point — schema is decided before execution).
    """

    @staticmethod
    def analyze(value, names, sep) -> "AnalyzeResult":
        from pyspark.sql.udtf import AnalyzeResult

        if names.value is None:
            raise ValueError(
                "split_fields: the column-name list must be a constant"
            )
        schema = StructType()
        for c in str(names.value).split(","):
            schema = schema.add(c.strip(), StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, value: str, names: str, sep: str):  # noqa: D102
        cols = [c.strip() for c in names.split(",")]
        if value is None:
            yield tuple([None] * len(cols))
            return
        parts = value.split(sep)
        parts = parts[: len(cols)] + [None] * (len(cols) - len(parts))
        yield tuple(parts)
