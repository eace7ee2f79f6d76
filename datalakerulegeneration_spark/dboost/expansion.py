"""dBoost tuple expansion (D1): schema-driven generated feature columns.

The reference expands each field by Python type via a ``@rule``
decorator registry (profiling/dBoost/dboost/features/__init__.py:13-24,
36-134) in a per-tuple generator. Spark version: the registry maps a
Spark type to a list of (feature_name, Column-builder); expansion is a
single ``select`` producing ``<col>__<feature>`` columns — generated
columns inside whole-stage codegen, no Python.

Features mirrored from the reference:
* int: identity, mod10, bits 0-5, div3/div5, unix2date parts
  (year/month/day/weekday), is_weekend (features/__init__.py:96-134);
* float: identity, fractional part;
* string: length, is_empty, is_upper_case, is_digits, looks_like_email,
  ``<num>``-masked signature, Unicode-category signature
  (features/__init__.py:36-76, 48-50);
* timestamp: year/month/day/weekday/is_weekend.

``unicode_sig`` is the one Python-path feature (unicodedata has no
Spark builtin; SURVEY §7.3.1 sanctions a pandas_udf) and sits in
``DEFAULT_DISABLED`` so the default expansion stays wholly inside
whole-stage codegen — pass ``disabled=set()`` to enable it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMAIL_RE = r"^[^@\s]+@[^@\s]+\.[^@\s]+$"

# python-path features excluded unless explicitly enabled
DEFAULT_DISABLED = {"unicode_sig"}

# epoch range the reference treats as plausible unix timestamps
_UNIX_LO, _UNIX_HI = 10_000_000, 10_000_000_000


def _int_features(c: Column) -> list[tuple[str, Column]]:
    ts = F.to_timestamp(F.from_unixtime(c))
    plausible = (c >= _UNIX_LO) & (c <= _UNIX_HI)
    return [
        ("id", c.cast("double")),
        ("mod10", (c % 10).cast("double")),
        # bit planes + divisibility flags (features/__init__.py:96-110,
        # registered at :131-134 as bits(0..5), div(3,5))
        *[
            (f"bit{b}", F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)).cast("double"))
            for b in range(6)
        ],
        ("div3", (c % 3 == 0).cast("double")),
        ("div5", (c % 5 == 0).cast("double")),
        ("unix_year", F.when(plausible, F.year(ts)).cast("double")),
        ("unix_month", F.when(plausible, F.month(ts)).cast("double")),
        ("unix_weekday", F.when(plausible, F.dayofweek(ts)).cast("double")),
        ("is_weekend", F.when(plausible, F.dayofweek(ts).isin(1, 7).cast("int")).cast("double")),
    ]


def _float_features(c: Column) -> list[tuple[str, Column]]:
    return [
        ("id", c.cast("double")),
        ("frac", (c - F.floor(c)).cast("double")),
    ]


def _string_features(c: Column) -> list[tuple[str, Column]]:
    s = c.cast("string")
    return [
        ("length", F.length(s).cast("double")),
        ("is_empty", (s == "").cast("double")),
        ("is_upper", (F.upper(s) == s).cast("double")),
        ("is_digits", s.rlike(r"^\d+$").cast("double")),
        ("is_email", s.rlike(EMAIL_RE).cast("double")),
        # categorical signature: digits masked to <num> (features/__init__.py:71-76)
        ("sig", F.regexp_replace(s, r"\d+", "<num>")),
        # F11 Unicode-category signature (features/__init__.py:48-50) —
        # the only Python-path feature; in DEFAULT_DISABLED
        ("unicode_sig", _unicode_sig_udf()(s)),
    ]


def _unicode_sig_udf():
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def unicode_sig(s):
        import unicodedata

        return s.map(
            lambda v: None
            if v is None
            else ",".join(unicodedata.category(ch) for ch in v)
        )

    # real annotation objects: the module's `from __future__ import
    # annotations` would stringify inline hints, which pyspark's
    # signature inspection cannot resolve in this namespace
    unicode_sig.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(unicode_sig, "string")


def _timestamp_features(c: Column) -> list[tuple[str, Column]]:
    return [
        ("year", F.year(c).cast("double")),
        ("month", F.month(c).cast("double")),
        ("day", F.dayofmonth(c).cast("double")),
        ("weekday", F.dayofweek(c).cast("double")),
        ("is_weekend", F.dayofweek(c).isin(1, 7).cast("int").cast("double")),
    ]


def features_for(dtype: T.DataType, c: Column) -> list[tuple[str, Column]]:
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return _int_features(c)
    if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        return _float_features(c)
    if isinstance(dtype, T.TimestampType):
        return _timestamp_features(c)
    if isinstance(dtype, T.StringType):
        return _string_features(c)
    return []


def expand(
    df: DataFrame,
    columns: list[str] | None = None,
    disabled: set[str] | None = None,
    row_id_col: str | None = None,
) -> DataFrame:
    """Expanded-tuple DataFrame: ``__row_id`` + ``<col>__<feature>``.

    ``disabled`` removes feature names globally (the reference's ``-d``
    flag, dboost/__init__.py:7-13); ``None`` means DEFAULT_DISABLED
    (the Python-path unicode signature off, keeping the default plan
    codegen-only) — pass an explicit set() to enable everything.
    """
    disabled = DEFAULT_DISABLED if disabled is None else disabled
    cols = columns or df.columns
    if not (row_id_col and row_id_col in df.columns):
        # positional ids in the SAME id space the rule engine and
        # ground-truth differ use (JVM-side partition-offset ids), so dBoost discrepancy
        # row_ids join against violations/truth; monotonically_
        # increasing_id would be partition-dependent and disjoint
        from datalakerulegeneration_spark.evaluation.ground_truth import with_row_id

        df = with_row_id(df, None)
        row_id_col = "__row_id"
    out: list[Column] = []
    out.append(F.col(f"`{row_id_col}`").cast("string").alias("__row_id"))
    for f in df.schema.fields:
        if f.name not in cols:
            continue
        for name, expr in features_for(f.dataType, F.col(f"`{f.name}`")):
            if name in disabled:
                continue
            out.append(expr.alias(f"{f.name}__{name}"))
    return df.select(*out)


def numeric_feature_columns(expanded: DataFrame) -> list[str]:
    return [
        f.name
        for f in expanded.schema.fields
        if f.name != "__row_id" and isinstance(f.dataType, T.DoubleType)
    ]


def categorical_feature_columns(expanded: DataFrame) -> list[str]:
    return [
        f.name
        for f in expanded.schema.fields
        if f.name != "__row_id" and isinstance(f.dataType, T.StringType)
    ]
