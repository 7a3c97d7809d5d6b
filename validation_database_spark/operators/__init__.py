from .keys import composite_id
from .compare import coerce_check, differing_values, fuzzy_ratio_udf
from .reconcile import missing_ids, join_pairs, reconcile
from .report import report_summary

__all__ = [
    "composite_id",
    "coerce_check",
    "differing_values",
    "fuzzy_ratio_udf",
    "missing_ids",
    "join_pairs",
    "reconcile",
    "report_summary",
]
