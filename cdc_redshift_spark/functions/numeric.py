"""Driver-side numeric helpers shared by operators that mirror
float arithmetic into SQL oracles."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal


def round_half_away(x: float, nd: int) -> float:
    """Round like Spark's ``F.round`` on DOUBLE (and DuckDB's
    ``round``): decimal round of the shortest-repr value with ties
    AWAY from zero.  Python's builtin ``round`` is banker's
    (half-to-even), which silently diverges from both engines exactly
    on tie boundaries — the one case rounding exists to pin down.
    Driver-side math that claims cross-engine bit-parity (PCA power
    iteration, temperature-mix budgets) must use THIS.
    """
    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))
