"""Wide-integer decode functions (reference F1 fidelity).

The reference decodes hex token amounts as ``int(value, 16) / 10**18``
(``/root/reference/zones/public-icon/upstream/data_feeder.py:134,152,
208,261``) — values can exceed 64 bits, so ``F.conv`` (64-bit) silently
saturates. Two engine forms:

- ``hex_to_scaled_double``: JVM path for values that FIT in 64 bits
  (conv + divide) — the hot path when magnitudes are known-bounded;
- ``hex_to_scaled_double_udf``: Arrow-batched pandas UDF doing true
  arbitrary-precision ``int(x, 16)`` then scaling — the correctness
  path for >64-bit amounts. Vectorized at batch granularity (the per-
  element int() is unavoidable Python, amortized over Arrow batches —
  this is the documented exception, not a per-row UDF in a hot loop).

Malformed inputs → NULL (reference logs + skips bad rows,
``data_feeder.py:158-166``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

SCALE = 10**18


def hex_to_scaled_double(col: Column | str) -> Column:
    """JVM fast path: ≤64-bit hex → double / 1e18. NULL on malformed or
    wider-than-64-bit input (use the UDFs for those). Accepts 0x/0X
    prefixes and zero-padded fixed-width-16 encodings (the common
    on-chain form; conv treats 16 hex digits as unsigned 64-bit)."""
    c = F.col(col) if isinstance(col, str) else col
    clean = F.regexp_replace(c, "^0[xX]", "")
    return (
        F.when(clean.rlike("^[0-9a-fA-F]{1,16}$"), F.conv(clean, 16, 10).cast("double") / 1e18)
    )


def hex_to_scaled_double_udf():
    """Factory (pandas_udf registration needs an active session)."""

    @pandas_udf("double")
    def _udf(s: pd.Series) -> pd.Series:
        def dec(x):
            if x is None:
                return None
            try:
                # float() of a huge int raises OverflowError, not
                # ValueError — amounts beyond float range are NULL
                return float(int(str(x), 16)) / SCALE
            except (ValueError, OverflowError):
                return None

        return s.map(dec)

    return _udf


def hex_to_decimal_udf():
    """Exact variant factory: arbitrary-precision hex → Decimal(38,18)."""

    @pandas_udf("decimal(38,18)")
    def _udf(s: pd.Series) -> pd.Series:
        import decimal

        q = decimal.Decimal(SCALE)

        def dec(x):
            if x is None:
                return None
            try:
                v = int(str(x), 16)
                if v >= 10**38:  # unscaled value exceeds DECIMAL(38,18)
                    return None
                # default context prec=28 would silently round 29+ digit
                # amounts; 38 integral + 18 fractional needs prec >= 56
                with decimal.localcontext() as ctx:
                    ctx.prec = 60
                    return decimal.Decimal(v) / q
            except (ValueError, decimal.InvalidOperation):
                return None

        return s.map(dec)

    return _udf
