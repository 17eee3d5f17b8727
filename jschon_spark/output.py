"""Output formats mirroring the reference's four formatters
(/root/reference/jschon/output.py:39-165) on Spark result DataFrames.

``flag`` and ``basic`` are table-shaped (stay distributed); ``detailed``
and ``hierarchical`` re-nest one document's violations driver-side —
they are per-document inspection views, small by construction, exactly
as the reference builds them from the Result tree.

A formatter registry mirrors ``output_formatter``
(/root/reference/jschon/output.py:22-36): register a callable
``(validated_df, id_col) -> DataFrame | dict``.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FORMATTERS: dict[str, Callable] = {}


def output_formatter(name: str):
    def deco(fn):
        _FORMATTERS[name] = fn
        return fn
    return deco


def create_output(validated: DataFrame, fmt: str, id_col: str = "url", **kw) -> Any:
    try:
        formatter = _FORMATTERS[fmt]
    except KeyError:
        raise ValueError(f"unknown output format {fmt!r}") from None
    return formatter(validated, id_col, **kw)


@output_formatter("flag")
def flag(validated: DataFrame, id_col: str) -> DataFrame:
    """{valid: bool} per document — one row each."""
    return validated.select(id_col, F.col("passed").alias("valid"))


@output_formatter("basic")
def basic(validated: DataFrame, id_col: str) -> DataFrame:
    """Flat violation list: the reference's basic 'errors' array
    (output.py:46-70) exploded to rows."""
    return (
        validated.filter(~F.col("passed"))
        .select(id_col, F.explode("violations").alias("v"))
        .select(
            id_col,
            F.col("v.keyword").alias("keyword"),
            F.col("v.keyword_path").alias("keywordLocation"),
            F.col("v.instance_path").alias("instanceLocation"),
            F.col("v.error").alias("error"),
        )
    )


@output_formatter("detailed")
def detailed(validated: DataFrame, id_col: str, doc_id: Any = None) -> dict:
    """One document's violations re-nested by instance location
    (driver-side; per-document data is small by construction)."""
    row = (
        validated.filter(F.col(id_col) == doc_id)
        .select("passed", "violations")
        .collect()
    )
    if not row:
        raise KeyError(f"document {doc_id!r} not found")
    passed, violations = row[0].passed, row[0].violations or []
    tree: dict = {"valid": bool(passed), "instanceLocation": "", "errors": []}
    by_path: dict[str, dict] = {"": tree}
    for v in sorted(violations, key=lambda v: v.instance_path):
        node = by_path.setdefault(
            v.instance_path,
            {"valid": False, "instanceLocation": v.instance_path, "errors": []},
        )
        node["errors"].append(
            {
                "keyword": v.keyword,
                "keywordLocation": v.keyword_path,
                "error": v.error,
                "value": v.value,
            }
        )
        if v.instance_path:
            parent = by_path[""]
            if node not in parent.setdefault("children", []):
                parent["children"].append(node)
    return tree


ANNOTATION_KEYWORDS = (
    # /root/reference/jschon/vocabulary/annotation.py:19-73 — all
    # annotate-only (noassert); compile-time constants in our engine
    "title", "description", "default", "deprecated", "readOnly",
    "writeOnly", "examples", "format", "contentMediaType",
    "contentEncoding",
)


def collect_annotations(schema, kpath: str = "") -> list[dict]:
    """Static annotation table of a schema document: one row per
    (keyword_path, keyword, value). Annotations are schema constants
    (zero runtime cost, SURVEY.md §2.4); this surfaces them the way the
    reference's verbose output does."""
    out: list[dict] = []
    if not isinstance(schema, dict):
        return out
    for kw in ANNOTATION_KEYWORDS:
        if kw in schema:
            out.append({"keyword_path": f"{kpath}/{kw}", "keyword": kw,
                        "value": schema[kw]})
    for kw, val in schema.items():
        if kw in ("enum", "const", "default", "examples"):
            continue
        if isinstance(val, dict):
            out.extend(collect_annotations(val, f"{kpath}/{kw}"))
        elif isinstance(val, list):
            for i, item in enumerate(val):
                if isinstance(item, dict):
                    out.extend(collect_annotations(item, f"{kpath}/{kw}/{i}"))
    return out


@output_formatter("verbose")
def verbose(
    validated: DataFrame, id_col: str, doc_id: Any = None, schema: Any = None
) -> dict:
    """One document's full evaluation view — valid flag, every violation
    (nested like ``detailed``) PLUS the schema's static annotations
    (title/description/... are compile-time constants in this engine, so
    the reference's per-node annotation output
    (/root/reference/jschon/output.py:107-127) reduces to the schema's
    annotation table attached to the per-document verdict)."""
    tree = detailed(validated, id_col, doc_id=doc_id)
    tree["annotations"] = [
        {
            "keywordLocation": a["keyword_path"],
            "keyword": a["keyword"],
            "annotation": a["value"],
        }
        for a in collect_annotations(schema or {})
    ]
    return tree


@output_formatter("hierarchical")
def hierarchical(validated: DataFrame, id_col: str, doc_id: Any = None) -> dict:
    """Alias shape over detailed for now (full keyword-tree nesting is a
    driver-side presentation concern; same data)."""
    return detailed(validated, id_col, doc_id=doc_id)
