from .cleaning import (
    empty_to_null,
    lower_norm,
    negative_to_null,
    record_hash,
    trim_clean,
)
from .dates import (
    add_months,
    date_spine,
    end_of_month,
    month_index,
    month_name,
    month_start,
)
from .money import exact_avg, exact_sum

__all__ = [
    "trim_clean",
    "empty_to_null",
    "lower_norm",
    "negative_to_null",
    "record_hash",
    "month_start",
    "end_of_month",
    "add_months",
    "month_index",
    "month_name",
    "date_spine",
    "exact_sum",
    "exact_avg",
]
