"""Extension registries: custom formats and custom keywords.

Mirrors the reference's plugin surfaces —
``@format_validator`` (/root/reference/jschon/vocabulary/format.py:47-66)
and custom ``Keyword`` classes (/root/reference/examples/custom_keyword.py)
— reshaped for columnar execution: an extension contributes either a
Column-builder (fast path) or a Python predicate (batch path), ideally
both.
"""

from jschon_spark.functions.registry import (
    format_validator,
    custom_keyword,
    FORMAT_REGISTRY,
    KEYWORD_REGISTRY,
)

__all__ = [
    "format_validator",
    "custom_keyword",
    "FORMAT_REGISTRY",
    "KEYWORD_REGISTRY",
]
