"""Scalar function library — the reference's row-wise ``apply`` logic
re-expressed as native column expressions (SURVEY §2.9 port policy:
no UDFs for expressible math)."""

from .geo import dead_reckon, infer_continent
from .money import exact_avg, exact_sum, sql_exact_avg, sql_exact_sum

__all__ = [
    "dead_reckon",
    "infer_continent",
    "exact_avg",
    "exact_sum",
    "sql_exact_avg",
    "sql_exact_sum",
]
