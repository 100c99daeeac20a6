"""Scalar/column helpers shared across operators.

These cover the reference's scalar-function surface (SURVEY.md §2.8) plus
the vector math the north-star extension operators need. Everything here is
built from ``pyspark.sql.functions`` — JVM-side, codegen-eligible; no Python
row UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Dates / time (reference F-5..F-8, W-2)
# ---------------------------------------------------------------------------


def to_date_ddmmyyyy(col: Column | str) -> Column:
    """Parse the reference's ``dd-mm-yyyy`` date strings.

    The reference double-parses (``ml_forecast_anomaly.py:123`` infers
    mm-dd-yyyy for days <= 12, then :125 re-parses as a no-op). We implement
    the single correct parse everywhere — SURVEY.md §4.4.1.
    """
    return F.to_date(F.col(col) if isinstance(col, str) else col, "dd-MM-yyyy")


def weekday_mon0(col: Column | str) -> Column:
    """Day of week, Monday=0 .. Sunday=6 — pandas ``.dt.dayofweek`` semantics
    (``ml_forecast_anomaly.py:212``). Spark's ``dayofweek`` is Sunday=1, so we
    use ``weekday`` which matches pandas directly.
    """
    return F.weekday(F.col(col) if isinstance(col, str) else col)


# ---------------------------------------------------------------------------
# Casts (reference F-2/F-3): error -> NULL, matching Python's
# float()/int()-with-except-None in blobToCosmos.py:62-70.
# ---------------------------------------------------------------------------


def try_double(col: Column | str) -> Column:
    return (F.col(col) if isinstance(col, str) else col).try_cast("double")


def try_int(col: Column | str) -> Column:
    return (F.col(col) if isinstance(col, str) else col).try_cast("int")


# ---------------------------------------------------------------------------
# Vector math over array<float>/array<double> embedding columns.
#
# Computed as a sequential double-precision fold so the result is
# bit-identical to the DuckDB oracle's equivalent expression (both engines
# cast each element to double, multiply pairwise, then left-fold the sum).
# ---------------------------------------------------------------------------


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# ---------------------------------------------------------------------------
# Text helpers (north-star text analysis)
# ---------------------------------------------------------------------------

TOKEN_SPLIT_RE = r"\s+"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of non-empty tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles (token n-grams) as an array<string>.

    Built as a zip_with chain over j-shifted slices of the token array:
    zip(toks, shift1, shift2, ...) concatenated pairwise. This references
    the token-array expression O(n) times PER ROW; an element_at-per-index
    formulation re-evaluates the string split per shingle element (no CSE
    inside lambda bodies), which is O(tokens^2) splits per document and
    measured ~10x slower on 300-char docs.

    zip_with pads the shorter (shifted) side with NULL; concat propagates
    the NULL, and array_compact drops the resulting tail entries, leaving
    exactly size-n+1 shingles. All JVM-side, no UDF.
    """
    return F.array_distinct(word_grams(col, n))


def word_grams(col: Column | str, n: int = 2) -> Column:
    """Position-ordered (NON-distinct) n-word grams as an array<string>.

    Same zip_with-chain construction as :func:`word_shingles` but without
    the final array_distinct — one element per gram *position*, which the
    repetition metrics (duplicate-gram fractions) need. A doc with k
    tokens yields max(k - n + 1, 0) grams.
    """
    toks = tokens(col)
    acc = toks
    for j in range(1, n):
        shifted = F.slice(
            toks, j + 1, F.greatest(F.size(toks) - j, F.lit(0))
        )
        acc = F.zip_with(acc, shifted, lambda x, y: F.concat(x, F.lit(" "), y))
    return F.array_compact(acc)
