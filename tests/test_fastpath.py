"""Fastpath differential: the closure-compiled predicate must agree
with the interpretive evaluator on every fixture case it claims to
support, and decline (None) on annotation/dynamic keywords."""

from __future__ import annotations

import random

import pytest

from jschon_spark.evaluator import Evaluator
from jschon_spark.fastpath import compile_valid
from jschon_spark.schema.catalog import SchemaCatalog
from tests.keyword_cases import CASES, FORMAT_CASES


def _compile(schema, assert_formats=False):
    catalog = SchemaCatalog()
    base = catalog.register(schema)
    ev = Evaluator(catalog, assert_formats=assert_formats)
    return compile_valid(schema, catalog, base, assert_formats, ev.formats), ev, base


@pytest.mark.parametrize(
    "case", CASES, ids=lambda c: c["description"]
)
def test_fastpath_matches_evaluator(case):
    schema = case["schema"]
    fast, ev, base = _compile(schema)
    if fast is None:
        assert any(
            k in str(schema) for k in ("unevaluated", "$dynamicRef", "$recursiveRef")
        ), f"fastpath declined a supported schema: {schema}"
        return
    for data, want in case["tests"]:
        assert fast(data) is want, f"{schema} {data!r}"


@pytest.mark.parametrize("case", FORMAT_CASES, ids=lambda c: c["description"])
def test_fastpath_formats(case):
    fast, ev, base = _compile(case["schema"], assert_formats=True)
    assert fast is not None
    for data, want in case["tests"]:
        assert fast(data) is want


def test_fastpath_declines_unevaluated():
    fast, _, _ = _compile({"unevaluatedProperties": False})
    assert fast is None
    fast, _, _ = _compile(
        {"allOf": [{"properties": {"a": {"unevaluatedItems": False}}}]}
    )
    assert fast is None


def test_fastpath_recursive_ref():
    schema = {
        "$defs": {"node": {
            "type": "object",
            "properties": {"v": {"type": "integer"}, "next": {"$ref": "#/$defs/node"}},
            "required": ["v"],
        }},
        "$ref": "#/$defs/node",
    }
    fast, ev, base = _compile(schema)
    assert fast is not None
    deep_ok = {"v": 1}
    node = deep_ok
    for i in range(50):
        node["next"] = {"v": i}
        node = node["next"]
    assert fast(deep_ok) is True
    bad = {"v": 1, "next": {"v": "x"}}
    assert fast(bad) is False


def test_fastpath_fuzz_against_evaluator():
    rng = random.Random(7)

    def rand_val(depth=0):
        choices = [None, True, False, rng.randint(-5, 5), rng.random() * 10,
                   "", "abc", "zz9"]
        if depth < 2:
            choices += [
                [rand_val(depth + 1) for _ in range(rng.randint(0, 3))],
                {f"k{rng.randint(0,3)}": rand_val(depth + 1) for _ in range(rng.randint(0, 3))},
            ]
        return rng.choice(choices)

    schemas = [c["schema"] for c in CASES]
    for schema in schemas:
        fast, ev, base = _compile(schema)
        if fast is None:
            continue
        for _ in range(30):
            v = rand_val()
            want = ev.validate(schema, v).valid
            assert fast(v) is want, f"{schema} {v!r}"
