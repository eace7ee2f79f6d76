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
    """Exact micro-unit integer of a 6-decimal-quantized value."""
    from decimal import Decimal

    return int(Decimal(str(round(float(x), 6))).scaleb(6))
