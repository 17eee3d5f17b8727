"""RFC 6902 JSON Patch + RFC 6901-relative pointers, from scratch.

Reference surface: /root/reference/jschon/jsonpatch.py:24-331 (the six
ops) and /root/reference/jschon/jsonpointer.py:276-393
(RelativeJSONPointer with up/over/# navigation). Ours is a plain
functional implementation over dicts/lists; the Spark form applies a
compiled patch to a JSON-string column in Arrow batches
(``patch_json_column``) — document mutation is row-local, so it
parallelizes trivially.
"""

from __future__ import annotations

import copy
import json
import re
from typing import Any

import pandas as pd

from jschon_spark.schema.catalog import pointer_unescape


class JSONPatchError(ValueError):
    pass


def _split(pointer: str) -> list[str]:
    if pointer == "":
        return []
    if not pointer.startswith("/"):
        raise JSONPatchError(f"invalid pointer {pointer!r}")
    return [pointer_unescape(t) for t in pointer.split("/")[1:]]


# RFC 6901: an array index is "0" or digits with no leading zero —
# int() alone would accept "01", "+1", " 1" and NEGATIVE indexes
# (which wrap around in Python lists)
_IDX_RE = re.compile(r"^(0|[1-9][0-9]*)$")


def _index(t: str, pointer: str) -> int:
    if not _IDX_RE.match(t):
        raise JSONPatchError(f"invalid array index {t!r} in {pointer!r}")
    return int(t)


def _walk_to_parent(doc: Any, pointer: str) -> tuple[Any, str]:
    tokens = _split(pointer)
    if not tokens:
        raise JSONPatchError("cannot address the document root here")
    node = doc
    for t in tokens[:-1]:
        if isinstance(node, dict):
            if t not in node:
                raise JSONPatchError(f"path not found: {pointer!r}")
            node = node[t]
        elif isinstance(node, list):
            i = _index(t, pointer)
            if not i < len(node):
                raise JSONPatchError(f"index out of range: {pointer!r}")
            node = node[i]
        else:
            raise JSONPatchError(f"cannot descend into leaf at {t!r}")
    return node, tokens[-1]


def _get(doc: Any, pointer: str) -> Any:
    node = doc
    for t in _split(pointer):
        if isinstance(node, dict):
            if t not in node:
                raise JSONPatchError(f"path not found: {pointer!r}")
            node = node[t]
        elif isinstance(node, list):
            i = _index(t, pointer)
            if not i < len(node):
                raise JSONPatchError(f"index out of range: {pointer!r}")
            node = node[i]
        else:
            raise JSONPatchError(f"cannot descend into leaf: {pointer!r}")
    return node


def _add(doc: Any, path: str, value: Any) -> Any:
    if path == "":
        return value
    parent, key = _walk_to_parent(doc, path)
    if isinstance(parent, list):
        idx = len(parent) if key == "-" else _index(key, path)
        if not idx <= len(parent):
            raise JSONPatchError(f"add index out of range: {path!r}")
        parent.insert(idx, value)
    elif isinstance(parent, dict):
        parent[key] = value
    else:
        raise JSONPatchError(f"cannot add into leaf: {path!r}")
    return doc


def _remove(doc: Any, path: str) -> Any:
    if path == "":
        raise JSONPatchError("cannot remove the document root")
    parent, key = _walk_to_parent(doc, path)
    if isinstance(parent, list):
        idx = _index(key, path)
        if not idx < len(parent):
            raise JSONPatchError(f"remove index out of range: {path!r}")
        del parent[idx]
    elif isinstance(parent, dict):
        if key not in parent:
            raise JSONPatchError(f"remove path not found: {path!r}")
        del parent[key]
    return doc


def apply_patch(document: Any, patch: list[dict]) -> Any:
    """Apply an RFC 6902 patch; the input document is not mutated."""
    from jschon_spark.evaluator import json_equal

    doc = copy.deepcopy(document)
    for i, op in enumerate(patch):
        try:
            kind = op["op"]
            path = op["path"]
        except KeyError as e:
            raise JSONPatchError(f"patch op {i}: missing {e}") from None
        if kind == "add":
            doc = _add(doc, path, copy.deepcopy(op["value"]))
        elif kind == "remove":
            doc = _remove(doc, path)
        elif kind == "replace":
            _get(doc, path)  # must exist
            doc = _remove(doc, path) if path else None
            doc = _add(doc if path else None, path, copy.deepcopy(op["value"]))
        elif kind == "move":
            frm = op["from"]
            # RFC 6902 §4.4: "from" MUST NOT be a proper prefix of
            # "path" — a location cannot be moved into its own child
            if path != frm and (frm == "" or path.startswith(frm + "/")):
                raise JSONPatchError(
                    f"cannot move {frm!r} into its own child {path!r}")
            val = _get(doc, frm)
            doc = _remove(doc, frm)
            doc = _add(doc, path, val)
        elif kind == "copy":
            val = copy.deepcopy(_get(doc, op["from"]))
            doc = _add(doc, path, val)
        elif kind == "test":
            if not json_equal(_get(doc, path), op["value"]):
                raise JSONPatchError(f"test failed at {path!r}")
        else:
            raise JSONPatchError(f"unknown op {kind!r}")
    return doc


# -- RelativeJSONPointer (up[#|pointer], e.g. "2/foo", "0#") -----------------

_REL_RE = re.compile(r"^(0|[1-9][0-9]*)([+-][0-9]+)?(#|(?:/.*)?)$", re.DOTALL)


def evaluate_relative(
    doc: Any, start_pointer: str, rel: str
) -> Any:
    """Evaluate a Relative JSON Pointer from the node at start_pointer.

    Supports up-count, array index adjustment (+n/-n), '#' (key or
    index of the current node) and a trailing pointer.
    """
    m = _REL_RE.match(rel)
    if not m:
        raise JSONPatchError(f"invalid relative pointer {rel!r}")
    up, adjust, rest = int(m.group(1)), m.group(2), m.group(3)
    tokens = _split(start_pointer) if start_pointer else []
    if up > len(tokens):
        raise JSONPatchError(f"cannot go up {up} from {start_pointer!r}")
    tokens = tokens[: len(tokens) - up] if up else tokens
    if adjust:
        if not tokens:
            raise JSONPatchError("index adjustment at document root")
        try:
            idx = int(tokens[-1])
        except ValueError:
            raise JSONPatchError("index adjustment on a non-index token") from None
        idx += int(adjust)
        if idx < 0:
            raise JSONPatchError("index adjustment below zero")
        tokens[-1] = str(idx)

    def _step(node: Any, t: str) -> Any:
        try:
            return node[t] if isinstance(node, dict) else node[_index(t, rel)]
        except (KeyError, IndexError, TypeError):
            raise JSONPatchError(f"path not found at {t!r}") from None

    if rest == "#":
        if not tokens:
            raise JSONPatchError("'#' at document root")
        parent = doc
        for t in tokens[:-1]:
            parent = _step(parent, t)
        return int(tokens[-1]) if isinstance(parent, list) else tokens[-1]
    node = doc
    for t in tokens:
        node = _step(node, t)
    if rest:
        node = _get(node, rest)
    return node


# -- Spark form ---------------------------------------------------------------

def patch_json_column(df, json_col: str, patch: list[dict], out_col: str = "patched"):
    """Apply one compiled patch to every document of a JSON-string
    column (Arrow batches; compile-once on the driver). Rows whose
    patch fails (test op, missing path) yield NULL."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    patch_blob = json.dumps(patch)

    @F.pandas_udf(T.StringType())
    def apply_batch(docs: pd.Series) -> pd.Series:
        ops = json.loads(patch_blob)

        def one(doc):
            if doc is None:
                return None
            try:
                return json.dumps(
                    apply_patch(json.loads(doc), ops),
                    separators=(",", ":"),
                    allow_nan=False,
                )
            except (JSONPatchError, ValueError, KeyError):
                return None

        return docs.map(one)

    return df.withColumn(out_col, apply_batch(F.col(json_col)))
