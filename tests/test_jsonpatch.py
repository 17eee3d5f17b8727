"""RFC 6902 JSON Patch + Relative JSON Pointer tests (RFC examples)."""

from __future__ import annotations

import json

import pytest

from jschon_spark.schema.jsonpatch import (
    JSONPatchError,
    apply_patch,
    evaluate_relative,
    patch_json_column,
)


def test_rfc6902_appendix_a_basics():
    doc = {"foo": "bar"}
    assert apply_patch(doc, [{"op": "add", "path": "/baz", "value": "qux"}]) == {
        "foo": "bar", "baz": "qux"
    }
    assert doc == {"foo": "bar"}  # input untouched

    assert apply_patch(
        {"foo": ["bar", "baz"]},
        [{"op": "add", "path": "/foo/1", "value": "qux"}],
    ) == {"foo": ["bar", "qux", "baz"]}

    assert apply_patch(
        {"baz": "qux", "foo": "bar"}, [{"op": "remove", "path": "/baz"}]
    ) == {"foo": "bar"}

    assert apply_patch(
        {"baz": "qux"}, [{"op": "replace", "path": "/baz", "value": "boo"}]
    ) == {"baz": "boo"}

    assert apply_patch(
        {"foo": {"bar": "baz", "waldo": "fred"}, "qux": {"corge": "grault"}},
        [{"op": "move", "from": "/foo/waldo", "path": "/qux/thud"}],
    ) == {"foo": {"bar": "baz"}, "qux": {"corge": "grault", "thud": "fred"}}

    assert apply_patch(
        {"foo": ["all", "grass", "cows", "eat"]},
        [{"op": "move", "from": "/foo/1", "path": "/foo/3"}],
    ) == {"foo": ["all", "cows", "eat", "grass"]}

    assert apply_patch(
        {"foo": "bar"},
        [{"op": "copy", "from": "/foo", "path": "/baz"}],
    ) == {"foo": "bar", "baz": "bar"}


def test_test_op_and_failures():
    apply_patch({"a": 1}, [{"op": "test", "path": "/a", "value": 1.0}])  # 1 == 1.0
    with pytest.raises(JSONPatchError):
        apply_patch({"a": 1}, [{"op": "test", "path": "/a", "value": True}])
    with pytest.raises(JSONPatchError):
        apply_patch({"a": 1}, [{"op": "remove", "path": "/b"}])
    with pytest.raises(JSONPatchError):
        apply_patch({"a": []}, [{"op": "add", "path": "/a/5", "value": 1}])
    with pytest.raises(JSONPatchError):
        apply_patch({}, [{"op": "nope", "path": ""}])


def test_add_array_dash_and_root_replace():
    assert apply_patch({"a": [1]}, [{"op": "add", "path": "/a/-", "value": 2}]) == {"a": [1, 2]}
    assert apply_patch({"x": 1}, [{"op": "replace", "path": "", "value": [9]}]) == [9]
    assert apply_patch({"x": 1}, [{"op": "add", "path": "", "value": "r"}]) == "r"


def test_relative_pointer_spec_examples():
    doc = {"foo": ["bar", "baz"], "highly": {"nested": {"objects": True}}}
    start = "/foo/1"
    assert evaluate_relative(doc, start, "0") == "baz"
    assert evaluate_relative(doc, start, "1/0") == "bar"
    assert evaluate_relative(doc, start, "0-1") == "bar"
    assert evaluate_relative(doc, start, "2/highly/nested/objects") is True
    assert evaluate_relative(doc, start, "0#") == 1
    assert evaluate_relative(doc, start, "0-1#") == 0
    assert evaluate_relative(doc, start, "1#") == "foo"
    start2 = "/highly/nested"
    assert evaluate_relative(doc, start2, "0/objects") is True
    assert evaluate_relative(doc, start2, "1/nested/objects") is True
    assert evaluate_relative(doc, start2, "2/foo/0") == "bar"
    with pytest.raises(JSONPatchError):
        evaluate_relative(doc, start, "9/foo")
    with pytest.raises(JSONPatchError):
        evaluate_relative(doc, "", "0#")


def test_patch_json_column(spark):
    df = spark.createDataFrame(
        [('{"a": 1}',), ('{"a": 2}',), ('{"b": 3}',), (None,)], "doc string"
    )
    patch = [
        {"op": "test", "path": "/a", "value": 1},
        {"op": "add", "path": "/ok", "value": True},
    ]
    rows = {r.doc: r.patched for r in patch_json_column(df, "doc", patch).collect()}
    assert json.loads(rows['{"a": 1}']) == {"a": 1, "ok": True}
    assert rows['{"a": 2}'] is None      # test op failed
    assert rows['{"b": 3}'] is None      # path missing
    assert rows[None] is None


def test_strict_array_indexes():
    # RFC 6901: "0" or digits without leading zero; int() alone would
    # accept "01" and negative indexes (which wrap in Python lists)
    for bad_path in ("/a/01", "/a/-1", "/a/+1", "/a/ 1"):
        with pytest.raises(JSONPatchError):
            apply_patch({"a": [1, 2]}, [{"op": "remove", "path": bad_path}])
    with pytest.raises(JSONPatchError):
        apply_patch({"a": [1]}, [{"op": "add", "path": "/a/01", "value": 9}])


def test_move_prefix_rule():
    # RFC 6902 §4.4: "from" must not be a proper prefix of "path" —
    # and the violation must surface as JSONPatchError, not KeyError
    with pytest.raises(JSONPatchError):
        apply_patch({"a": {"b": 1}}, [{"op": "move", "from": "/a", "path": "/a/c"}])
    with pytest.raises(JSONPatchError):
        apply_patch({"a": 1}, [{"op": "move", "from": "", "path": "/a"}])
    # equal paths and sibling names sharing a prefix are fine
    assert apply_patch({"a": {"b": 1}}, [{"op": "move", "from": "/a", "path": "/a"}]) == {"a": {"b": 1}}
    assert apply_patch({"a": 1, "ab": 2}, [{"op": "move", "from": "/a", "path": "/ab"}]) == {"ab": 1}


def test_traversal_misses_raise_patch_errors():
    # deep walks over missing containers must not leak KeyError
    with pytest.raises(JSONPatchError):
        apply_patch({}, [{"op": "add", "path": "/x/y", "value": 1}])
    with pytest.raises(JSONPatchError):
        evaluate_relative({"a": [1]}, "/a/0", "0-1")
