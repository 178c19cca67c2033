"""Property tests for the repo-wide engine-exactness discipline
(registry.py output conventions): money/ratio columns are computed in
integer fixed-point units and emitted as one correctly-rounded double
division, so Spark and DuckDB produce BIT-IDENTICAL float64 outputs.

These pin the arithmetic identities that discipline rests on, in pure
Python (no Spark session) so they run in milliseconds:

1. snapping a 2dp-representable double to integer cents via
   round(x * 100) recovers the exact decimal numerator;
2. the int-unit revenue formula cents*(100 - disc_hundredths) equals
   exact-Decimal extendedprice*(1-discount) scaled by 10^4;
3. the final double division of exact int64 units is the correctly
   rounded IEEE value of the rational — i.e. equal to
   float(Decimal(numerator) / Decimal(denominator)) — for every
   numerator within the 2^53 exactness envelope.
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

# 2dp money values as integer cents (TPC-H extendedprice ~ [901, 104950])
cents = st.integers(min_value=0, max_value=20_000_000)
# discounts/taxes: 0.00-0.10 in hundredths
hundredths = st.integers(min_value=0, max_value=10)
# int64 unit sums within the double-exact envelope
unit_sums = st.integers(min_value=-(2**53) + 1, max_value=2**53 - 1)
divisors = st.sampled_from([7, 10, 100, 1000, 10000] + list(range(1, 50)))


@given(cents)
@settings(max_examples=300)
def test_round_times_100_recovers_exact_cents(c: int) -> None:
    x = c / 100.0  # the parquet double a 2dp value is stored as
    assert round(x * 100) == c


@given(cents, hundredths)
@settings(max_examples=300)
def test_rev_unit_formula_matches_exact_decimal(c: int, dh: int) -> None:
    price = Decimal(c) / Decimal(100)
    disc = Decimal(dh) / Decimal(100)
    exact = price * (Decimal(1) - disc)  # scale-4 decimal
    units = c * (100 - dh)  # the _rev_u() integer
    assert Decimal(units) == exact * Decimal(10_000)


@given(unit_sums, divisors)
@settings(max_examples=500)
def test_double_division_of_exact_units_is_correctly_rounded(
    n: int, d: int
) -> None:
    # float(n)/float(d) with n, d exactly representable is ONE IEEE
    # operation → correctly rounded to the nearest double of n/d;
    # Decimal division at high precision then float() is the reference
    # correctly-rounded conversion.  Equality here is what makes the
    # Spark and DuckDB outputs bit-identical regardless of which side
    # evaluates the expression.
    ieee = float(n) / float(d)
    ref = float(Decimal(n) / Decimal(d))
    assert ieee == ref


@given(unit_sums)
@settings(max_examples=200)
def test_int64_in_double_envelope_is_exact(n: int) -> None:
    assert int(float(n)) == n
