"""Cross-engine exactness primitives for the frozen-parameter family.

ONE home for the two conventions every frozen serving split's
bit-parity argument depends on (r9 review: three modules had drifted
into private copies — a future fix to one would silently leave the
others on the old behavior):

* :func:`dlit` — a double literal with identical bits in Spark SQL and
  DuckDB. A bare decimal literal parses as DECIMAL in both engines and
  reaches DOUBLE through engine-specific decimal→double casts (~9% of
  random doubles land 1 ulp apart — verified against DuckDB);
  ``CAST('<repr>' AS DOUBLE)`` is a correctly-rounded string→double
  parse on each side, so the bits match (repr round-trips).
* :func:`micro6` — a value quantized at 6 decimals as an exact
  micro-unit BIGINT, the registry's standard portable float boundary
  (integer arithmetic is fold-order-free and bit-identical anywhere).
"""

from __future__ import annotations


def dlit(x: float) -> str:
    """Bit-identical double literal for both engines."""
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def micro6(x: float) -> int:
    """Exact micro-unit integer of a 6-decimal-quantized value.

    Quantizes with ROUND_HALF_UP over the shortest decimal repr —
    the same convention as Spark's double→DECIMAL(18,6) cast
    (java BigDecimal.valueOf uses Double.toString, then HALF_UP), so
    the frozen integer agrees with the engine-side quantization of the
    same value. Inputs SHOULD already be 6-decimal-quantized (the
    vendored fixtures are): for un-quantized floats sitting exactly on
    a .5-ulp boundary, DuckDB's binary-expansion-based decimal cast can
    still disagree with the repr-based path by one micro-unit, so the
    fixture generators quantize at freeze time rather than rely on
    this boundary behavior.
    """
    from decimal import ROUND_HALF_UP, Decimal, localcontext

    with localcontext() as ctx:
        # default context precision (28) makes quantize RAISE for
        # |x| >= 1e22 ("result has too many digits"); frozen stats can
        # legitimately carry any double magnitude (r10 review) — the
        # FULL double range needs 309 integer digits + 6 fractional
        ctx.prec = 320
        return int(
            Decimal(repr(float(x)))
            .quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
            .scaleb(6)
        )
