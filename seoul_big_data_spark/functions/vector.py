"""Vector math over ``array<float>`` embedding columns (north-star N3).

Native Catalyst higher-order functions (``zip_with`` + ``aggregate``) — the
dot product compiles to a tight loop in generated code, no Python in the hot
path, so similarity scans scale with the parquet read.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _double_sql(v) -> str:
    """Exact SQL rendering of one double. ``repr()`` round-trips finite
    IEEE doubles and the ``D`` suffix parses as DoubleType; non-finite
    values have no literal form the parser accepts (``nanD`` is a parse
    error — ADVICE r10), so they render as the CAST the parser does accept,
    which produces the same canonical NaN/±Infinity bits as ``F.lit``."""
    v = float(v)
    if v != v:
        return "CAST('NaN' AS DOUBLE)"
    if v == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if v == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return repr(v) + "D"


def lit_double_array(vals) -> Column:
    """``array<double>`` literal built as ONE parsed expression (r10).

    ``F.array(*[F.lit(v) ...])`` costs one py4j round trip per element —
    a k×dim codebook literal is hundreds of driver→JVM calls, measured as
    multi-second PLAN-CONSTRUCTION time in the PQ/IVF queries (pq_codes_md5:
    5.7 s build vs 0.8 s execution). One ``F.expr`` string is a single
    round trip; rendering is bit-equal to the F.lit form (non-finite values
    included — see :func:`_double_sql`)."""
    return F.expr("array(" + ",".join(_double_sql(v) for v in vals) + ")")


def lit_double_matrix(rows) -> Column:
    """``array<array<double>>`` literal as one parsed expression — the
    nested form of :func:`lit_double_array` (PQ codebooks)."""
    inner = [
        "array(" + ",".join(_double_sql(v) for v in r) + ")" for r in rows
    ]
    return F.expr("array(" + ",".join(inner) + ")")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length float arrays, accumulated in double
    (matches engines that upcast before multiplying; float*float would lose
    precision and destabilize top-k ordering)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def to_double_array(a: Column | str) -> Column:
    """Element-wise cast to ``array<double>`` — hoist this to a per-ROW
    projection before a pair join so ``dot_precast`` skips the two per-pair
    casts ``dot`` pays. float→double widening is exact, so the downstream
    sums are bit-identical to ``dot``'s (same values, same order)."""
    return F.transform(_c(a), lambda x: x.cast("double"))


def dot_precast(a: Column | str, b: Column | str) -> Column:
    """``dot`` over arrays already cast to double (``to_double_array``):
    the same left-to-right double accumulation minus 2·dim casts per pair —
    the constant that dominates Σ|cell|² candidate scoring."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    """L2 norm."""
    return F.sqrt(
        F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector is all-zero.

    The norm product is let-bound (r10, functions/text.py::_bind): it is
    referenced by both the zero guard and the divisor, and Catalyst does
    not CSE the two references — un-bound, every scored pair paid four
    O(dim) norm folds instead of two. Same values, same op order."""
    from .text import _bind

    d = dot(a, b)
    return _bind(
        norm(a) * norm(b),
        lambda nn: F.when(nn > 0, d / nn).otherwise(F.lit(0.0)),
    )


def random_hyperplane_signs(a: Column | str, planes: list[list[float]]) -> Column:
    """LSH signature: sign bits of dot products with fixed random hyperplanes,
    packed into a string bucket key (scale path for ANN, SURVEY.md §2.10 N3)."""
    bits = [
        F.when(
            dot(_c(a), lit_double_array(plane)) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)
