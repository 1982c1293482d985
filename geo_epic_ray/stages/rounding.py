"""Correctly-rounded decimal rounding for oracle-checked float columns.

Why this exists: the driver's correctness gate hashes float columns
bit-exactly, so the Ray side and the DuckDB oracle must implement the
SAME decimal-rounding function. Neither np.round nor DuckDB round_even
is that function:

- np.round / pandas .round scale by 10^n IN FLOAT64 and rint the scaled
  double. A value like 28.205000000000002 (true value strictly above the
  .205 tie) scales to exactly 2820.5 and banker's-rounds DOWN to 28.20,
  while any correctly-rounded implementation returns 28.21.
- DuckDB round_even has its own scaled-double artifact in the other
  direction (observed misrounds at n=6 on sf0.1 data, profile_lai) and
  is not reproducible by any simple float64 formula.

Two implementations ARE correctly rounded on the true double value and
agree with exact rational arithmetic (verified on 1.3M adversarial
samples, n=0..8, including exact-tie constructions and their nextafter
neighbors):

- CPython's round(float, n)           (David Gay dtoa, ties-to-even)
- DuckDB  CAST(printf('%.nf', x) AS DOUBLE)   (fmt, ties-to-even)

round_decimal() below is the vectorized Ray-side twin of the printf
oracle form (see pipelines/oracle_sql.rnd): an 80-bit-longdouble rint
fast path, plus an exact CPython-round rescue for the few values whose
scaled product sits within longdouble's error band of a decimal tie
(rescue rate ~5e-6 at n=6 on uniform data, 0 at n<=4).
"""

from __future__ import annotations

import numpy as np

__all__ = ["round_decimal"]


def round_decimal(x, n: int) -> np.ndarray:
    """Round float64 values to n decimal places, correctly rounded on the
    TRUE double value with ties-to-even — bit-exact vs CPython round()
    and DuckDB CAST(printf('%.nf', x) AS DOUBLE).

    Valid for |x| * 10^n below 2^53 (the rounded integer must be exact in
    float64); NaN/inf pass through unchanged.
    """
    xs = np.asarray(x, dtype=np.float64)
    scale_ld = np.longdouble(10.0) ** n
    prod = xs.astype(np.longdouble) * scale_ld
    out = np.rint(prod).astype(np.float64) / (10.0**n)
    # Near-tie rescue: longdouble's 64-bit mantissa cannot discriminate a
    # double within ~2^-64 of a decimal tie; adjudicate those (and exact
    # ties) through CPython's correctly-rounded round().
    frac = np.abs(prod - np.floor(prod) - np.longdouble(0.5))
    tol = np.abs(prod) * np.longdouble(2.0**-48) + np.longdouble(2.0**-48)
    sus = np.nonzero((frac <= tol) & np.isfinite(xs))[0]
    if sus.size:
        out[sus] = [round(float(v), n) for v in xs[sus]]
    return out
