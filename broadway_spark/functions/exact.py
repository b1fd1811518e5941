"""Exact rational publication — integer ppm instead of fixed-dp rounds.

THE NUMERIC POLICY (BASELINE.md, learned twice at scale): a ratio of
exact integers (or exact decimals — counts, cents, micro-units) is a
rational number. ``round(n/m, d)`` of a rational can land EXACTLY on a
half-way case whenever m's reduced denominator is 2^(d+1)·5^j — e.g.
round(2215/3200, 6): 2215/3200 = 0.6921875 exactly — and there Spark's
HALF_UP over BigDecimal and DuckDB's round() over binary doubles split
by one ulp. Invisible at small scale factors, real at volume: this bit
at 6dp (evt_burstiness, r9) and again at 2dp (h7/h9/ds2/ds5, the r11
sf1 sweep). Fixed-dp rounds are therefore reserved for operands with an
irrational factor (sqrt/log/exp/pow with non-integer exponent), where
half-way cases have measure zero.

``ratio_ppm`` publishes the ratio as an exact BIGINT in parts-per-
million: ``(num · 1e6) DIV den`` — truncation toward zero, which Spark's
integral divide and DuckDB's ``//`` over HUGEINT both implement
identically at any magnitude (verified on negatives and half-way
cases). No rounding step exists, so no half-way case exists.

Spark has no Column-level DIV, so the truncating quotient is built from
the exact decimal remainder: ``q = (a − a % d) / d`` — ``%`` on decimals
is exact and follows the dividend's sign (truncation semantics), and the
final divide is exact because its operand is an exact integer multiple
of ``d``. Verified bit-equal to SQL ``DIV`` on sign/half-way/large cases.

DuckDB oracle twin for integer inputs::

    (CAST(num AS HUGEINT) * 1000000) // CAST(den AS HUGEINT)

and for DECIMAL(p,s) inputs (scales cancel in a ratio — scale BOTH
sides to unscaled integers)::

    (CAST(num * 10^s AS HUGEINT) * 1000000)
        // CAST(den * 10^s AS HUGEINT)

(DuckDB's ``//`` over DECIMAL does NOT integer-divide — route through
HUGEINT.)

Contract: |num·unit / den| must fit in BIGINT (ppm of any bounded ratio
does — the quotient is ~1e6·ratio); inputs must carry at most 6
fractional decimal digits (counts, cents, scale-4 price products,
micro-units all qualify). Out-of-contract magnitudes fail loudly
(CAST_OVERFLOW), never wrap.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PPM = 1_000_000


def div_trunc(num: Column, den: Column) -> Column:
    """Exact integral quotient of num/den truncated toward zero, as
    BIGINT — the Column-API equivalent of SQL ``num DIV den`` (and of
    DuckDB's ``//`` over HUGEINT). Exact for inputs with ≤ 6 fractional
    decimal digits and quotients within BIGINT.

    Zero denominators publish NULL, never raise: decimal ``%`` and
    ``/`` throw DIVIDE_BY_ZERO under Spark ANSI defaults, where the
    double path this helper replaced produced NULL per row and DuckDB's
    HUGEINT ``//`` yields NULL — one zero-denominator group (a
    zero-reconstruction-error archive cell, a zero-shingle doc) must
    not abort the whole query (r12 ADVICE)."""
    a = num.cast("decimal(38,6)")
    d = den.cast("decimal(38,6)")
    return F.when(d != 0, (a - a % d) / d).cast("long")


def ratio_ppm(num: Column, den: Column, unit: int = PPM) -> Column:
    """``(num * unit) DIV den`` as BIGINT — an exact integer
    parts-per-``unit`` publication of the rational num/den. The
    fixed-dp-round replacement mandated by the numeric policy for
    ratios of integer-typed (or exact-decimal) aggregates."""
    return div_trunc(num.cast("decimal(38,6)") * F.lit(unit), den)


def ppm(threshold: float, unit: int = PPM) -> int:
    """The canonical Python-side threshold→ppm conversion, used by BOTH
    operator filters and oracle-SQL literals so the two sides can never
    disagree (r12 ADVICE: operators used ``int(round(t*1e6))`` while
    entry filters/oracles used truncating ``int(t*1e6)`` — identical at
    0.2/0.5/0.8 but off by 1 for thresholds like 0.29 whose float·1e6
    lands just below an integer). ``Decimal(str(t))`` recovers the
    decimal the human wrote (repr round-trip), so 0.29 → 290000
    exactly; sub-ppm digits truncate."""
    from decimal import Decimal

    return int(Decimal(str(threshold)) * unit)
