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


def test_remote_source_routing(tmp_path):
    """RemoteSource over a real local HTTP server: longest-prefix
    routing, fetch-on-miss, cache-on-register, 404 -> fall-through."""
    import http.server
    import threading

    (tmp_path / "positive.json").write_text(
        json.dumps({"$id": "https://schemas.example/positive", "minimum": 0})
    )
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
        *a, directory=str(tmp_path), **kw
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        cat = SchemaCatalog()
        cat.add_remote_source(
            "https://schemas.example/", f"http://127.0.0.1:{port}/", suffix=".json"
        )
        node, base = cat.resolve("https://schemas.example/positive", "")
        assert node["minimum"] == 0 and base == "https://schemas.example/positive"
        # a missing resource (404 -> None) raises unresolvable, not a crash
        with pytest.raises(KeyError):
            cat.resolve("https://schemas.example/nope", "")
        # second resolve must hit the registry, not the network
        srv.shutdown()
        srv.server_close()
        node2, _ = cat.resolve("https://schemas.example/positive", "")
        assert node2 == node
    finally:
        srv.shutdown()
        srv.server_close()


def test_remote_source_feeds_ref_compilation(tmp_path):
    """$ref to a remote URI resolves through the routed source at
    compile time and validates through the engine."""
    import http.server
    import threading

    (tmp_path / "len.json").write_text(json.dumps({"maxLength": 3}))
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
        *a, directory=str(tmp_path), **kw
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        port = srv.server_address[1]
        from jschon_spark.evaluator import Evaluator

        cat = SchemaCatalog()
        cat.add_remote_source(
            "https://schemas.example/", f"http://127.0.0.1:{port}/", suffix=".json"
        )
        schema = {"$id": "https://local.example/s",
                  "$ref": "https://schemas.example/len"}
        cat.register(schema)
        ev = Evaluator(cat)
        assert ev.validate(schema, "ab").valid
        assert not ev.validate(schema, "abcd").valid
    finally:
        srv.shutdown()
        srv.server_close()


def test_scope_pops_registrations():
    """Catalog.scope(): schemas registered inside are dropped on exit;
    pre-existing resources survive; nested scopes unwind LIFO."""
    cat = SchemaCatalog()
    cat.register({"$id": "https://keep.example/s", "type": "integer"})
    with cat.scope() as sid:
        assert sid is not None
        cat.register({"$id": "https://tmp.example/a", "$anchor": "an",
                      "$dynamicAnchor": "dyn", "type": "string"})
        node, _ = cat.resolve("https://tmp.example/a", "")
        assert node["type"] == "string"
        with cat.scope("inner"):
            cat.register({"$id": "https://tmp.example/b"})
            cat.resolve("https://tmp.example/b", "")
        with pytest.raises(KeyError):
            cat.resolve("https://tmp.example/b", "")
        # outer-scope registration still live after inner exit
        cat.resolve("https://tmp.example/a", "")
    with pytest.raises(KeyError):
        cat.resolve("https://tmp.example/a", "")
    with pytest.raises(KeyError):
        cat.resolve("#an", "https://tmp.example/a")
    assert not cat.has_dynamic_anchor("https://tmp.example/a", "dyn")
    # untouched pre-existing resource
    node, _ = cat.resolve("https://keep.example/s", "")
    assert node["type"] == "integer"


def test_scope_duplicate_id_rejected():
    cat = SchemaCatalog()
    with cat.scope("x"):
        with pytest.raises(KeyError):
            with cat.scope("x"):
                pass


def test_static_dynamic_target_unique_owner():
    cat = SchemaCatalog()
    base = cat.register({
        "$id": "https://e.x/sd",
        "$defs": {"T": {"$dynamicAnchor": "T", "type": "string"}},
        "properties": {"x": {"$dynamicRef": "#T"}},
    })
    got = cat.static_dynamic_target("#T", base)
    assert got is not None
    target, tbase = got
    assert target["type"] == "string" and tbase == base


def test_static_dynamic_target_two_owners_is_dynamic():
    cat = SchemaCatalog()
    cat.register({"$id": "https://e.x/other",
                  "$defs": {"d": {"$dynamicAnchor": "T", "type": "number"}}})
    base = cat.register({
        "$id": "https://e.x/sd2",
        "$defs": {"T": {"$dynamicAnchor": "T", "type": "string"}},
    })
    assert cat.static_dynamic_target("#T", base) is None


def test_static_dynamic_target_plain_anchor_is_static():
    # fragment names a plain $anchor (no $dynamicAnchor on the target):
    # bookending fails, the ref behaves as $ref -> always static, even
    # with another resource owning a same-named DYNAMIC anchor
    cat = SchemaCatalog()
    cat.register({"$id": "https://e.x/noise",
                  "$defs": {"d": {"$dynamicAnchor": "T", "type": "number"}}})
    base = cat.register({
        "$id": "https://e.x/sd3",
        "$defs": {"T": {"$anchor": "T", "type": "integer"}},
    })
    got = cat.static_dynamic_target("#T", base)
    assert got is not None and got[0]["type"] == "integer"


def test_static_recursive_target():
    cat = SchemaCatalog()
    # no $recursiveAnchor anywhere -> plain-$ref semantics, static
    base = cat.register({"$id": "https://e.x/r1", "type": "object"})
    got = cat.static_recursive_target("#", base)
    assert got is not None and got[0]["type"] == "object"
    # anchored root, single owner -> rebinding provably lands back
    cat2 = SchemaCatalog()
    b2 = cat2.register({"$id": "https://e.x/r2", "$recursiveAnchor": True,
                        "type": "object"})
    got2 = cat2.static_recursive_target("#", b2)
    assert got2 is not None and got2[1] == b2
    # two anchored resources -> genuinely dynamic
    cat2.register({"$id": "https://e.x/r3", "$recursiveAnchor": True})
    assert cat2.static_recursive_target("#", b2) is None


def test_preload_ref_closure_registers_lazy_sources(tmp_path):
    # a cross-file $ref target that declares a dynamic anchor must be
    # loaded BEFORE the uniqueness decision, else a stale "single owner"
    # answer could let a genuinely dynamic ref lower
    (tmp_path / "ext.json").write_text(json.dumps({
        "$id": "https://schemas.example/ext",
        "$defs": {"d": {"$dynamicAnchor": "T", "type": "number"}},
    }))
    cat = SchemaCatalog()
    cat.add_local_source("https://schemas.example/", str(tmp_path) + "/")
    base = cat.register({
        "$id": "https://e.x/pc",
        "$defs": {"T": {"$dynamicAnchor": "T", "type": "string"}},
        "properties": {"ext": {"$ref": "https://schemas.example/ext"}},
    })
    root, _ = cat.resolve(base, "")
    cat.preload_ref_closure(root, base)
    # after the preload both owners are visible -> dynamic
    assert cat.static_dynamic_target("#T", base) is None
