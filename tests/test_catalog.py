"""SchemaCatalog: registration, anchors, refs, source routing."""

from __future__ import annotations

import json

import pytest

from jschon_spark.schema.catalog import SchemaCatalog, parse_json_strict


def test_register_and_resolve_pointer():
    cat = SchemaCatalog()
    schema = {"$id": "https://e.x/s", "$defs": {"a": {"type": "integer"}}}
    base = cat.register(schema)
    assert base == "https://e.x/s"
    node, nb = cat.resolve("#/$defs/a", base)
    assert node == {"type": "integer"} and nb == base


def test_embedded_id_and_anchor():
    cat = SchemaCatalog()
    schema = {
        "$id": "https://e.x/root",
        "$defs": {
            "sub": {"$id": "https://e.x/sub", "$anchor": "top", "type": "string"},
        },
    }
    cat.register(schema)
    node, base = cat.resolve("https://e.x/sub", "https://e.x/root")
    assert node["type"] == "string" and base == "https://e.x/sub"
    node2, _ = cat.resolve("sub#top", "https://e.x/root")  # relative + anchor
    assert node2 is node


def test_relative_id_resolution():
    cat = SchemaCatalog()
    cat.register({"$id": "https://e.x/dir/root", "$defs": {"s": {"$id": "other", "type": "null"}}})
    node, _ = cat.resolve("other", "https://e.x/dir/root")
    assert node["type"] == "null"


def test_unresolvable_raises():
    cat = SchemaCatalog()
    cat.register({"$id": "https://e.x/s"})
    with pytest.raises(KeyError):
        cat.resolve("https://nowhere.example/x", "https://e.x/s")
    with pytest.raises(KeyError):
        cat.resolve("#/nope/deep", "https://e.x/s")


def test_local_source_routing(tmp_path):
    (tmp_path / "thing.json").write_text(json.dumps({"type": "integer"}))
    cat = SchemaCatalog()
    cat.add_local_source("https://schemas.example/", str(tmp_path) + "/")
    node, base = cat.resolve("https://schemas.example/thing", "")
    assert node == {"type": "integer"}
    # registered after first load: second resolve hits the cache
    node2, _ = cat.resolve("https://schemas.example/thing", "")
    assert node2 == node


def test_dynamic_anchor_registry():
    cat = SchemaCatalog()
    cat.register({"$id": "https://e.x/t", "$dynamicAnchor": "node", "type": "object"})
    assert cat.has_dynamic_anchor("https://e.x/t", "node")
    assert cat.dynamic_anchor("https://e.x/t", "node")["type"] == "object"
    # a $dynamicAnchor is also addressable as a plain anchor
    node, _ = cat.resolve("#node", "https://e.x/t")
    assert node["type"] == "object"


def test_parse_json_strict_rejects_nan():
    assert parse_json_strict("1.5") == 1.5
    for bad in ("NaN", "Infinity", "-Infinity", "[NaN]"):
        with pytest.raises(ValueError):
            parse_json_strict(bad)


def test_enum_values_not_walked():
    # $id-looking strings inside enum/const are data, not schema ids
    cat = SchemaCatalog()
    cat.register({"$id": "https://e.x/s", "enum": [{"$id": "https://evil.example/x"}]})
    with pytest.raises(KeyError):
        cat.resolve("https://evil.example/x", "https://e.x/s")
