"""JSTS-style keyword conformance corpus (FIXTURES.md §3).

Format mirrors the official JSON-Schema-Test-Suite files the reference
consumes (/root/reference/tests/test_suite.py:149-176): each case is
{description, schema, tests: [{data, valid}]}. Cases are hand-authored
from the 2020-12 spec — one per keyword family at minimum, written to
cover the semantics SURVEY.md §2.1-2.3 calls out (bool-vs-number,
whole-float integers, decimal multipleOf, annotation-driven
unevaluated*, dynamic refs).
"""

CASES = [
    # ---- type ----
    {"description": "type string", "schema": {"type": "string"},
     "tests": [("a", True), (1, False), (None, False), ([], False), ({}, False), (True, False)]},
    {"description": "type integer accepts whole floats", "schema": {"type": "integer"},
     "tests": [(1, True), (1.0, True), (1.5, False), ("1", False), (True, False)]},
    {"description": "type number excludes bool", "schema": {"type": "number"},
     "tests": [(1, True), (1.5, True), (True, False), (False, False)]},
    {"description": "type list", "schema": {"type": ["string", "null"]},
     "tests": [("a", True), (None, True), (1, False)]},
    {"description": "type object/array", "schema": {"type": "object"},
     "tests": [({}, True), ([], False)]},
    # ---- enum / const ----
    {"description": "enum cross-type numeric", "schema": {"enum": [1, "x", [2], {"a": 3}]},
     "tests": [(1.0, True), ("x", True), ([2.0], True), ({"a": 3.0}, True),
               (True, False), (2, False), ([2, 3], False)]},
    {"description": "enum bool identity", "schema": {"enum": [True]},
     "tests": [(True, True), (1, False), (1.0, False)]},
    {"description": "const object", "schema": {"const": {"a": [1, 2]}},
     "tests": [({"a": [1.0, 2.0]}, True), ({"a": [1, 2, 3]}, False), ({"b": 1}, False)]},
    # ---- numeric ----
    {"description": "multipleOf decimal exact", "schema": {"multipleOf": 0.01},
     "tests": [(19.99, True), (19.999, False), (0, True), ("x", True)]},
    {"description": "multipleOf int", "schema": {"multipleOf": 2},
     "tests": [(4, True), (5, False), (4.0, True)]},
    {"description": "maximum", "schema": {"maximum": 3.0},
     "tests": [(3, True), (3.5, False), ("zzz", True)]},
    {"description": "exclusiveMaximum", "schema": {"exclusiveMaximum": 3},
     "tests": [(3, False), (2.9, True)]},
    {"description": "minimum", "schema": {"minimum": 1.1},
     "tests": [(1.1, True), (1, False)]},
    {"description": "exclusiveMinimum", "schema": {"exclusiveMinimum": 1},
     "tests": [(1, False), (1.5, True)]},
    # ---- string ----
    {"description": "maxLength codepoints", "schema": {"maxLength": 2},
     "tests": [("ab", True), ("abc", False), ("éé", True), (100, True)]},
    {"description": "minLength", "schema": {"minLength": 2},
     "tests": [("ab", True), ("a", False), ("", False)]},
    {"description": "pattern is unanchored search", "schema": {"pattern": "b.d"},
     "tests": [("abide bad", True), ("bd", False), ("xbzdy", True)]},
    # ---- array ----
    {"description": "maxItems/minItems", "schema": {"maxItems": 2, "minItems": 1},
     "tests": [([1], True), ([1, 2], True), ([], False), ([1, 2, 3], False)]},
    {"description": "uniqueItems deep equality", "schema": {"uniqueItems": True},
     "tests": [([1, 2], True), ([1, 1.0], False), ([True, 1], True),
               ([{"a": 1}, {"a": 1.0}], False), ([[1], [1.0]], False), ([], True)]},
    {"description": "prefixItems positional", "schema": {"prefixItems": [{"type": "integer"}, {"type": "string"}]},
     "tests": [([1, "a"], True), ([1, "a", 999], True), (["a", 1], False), ([1], True)]},
    {"description": "items after prefixItems", "schema": {"prefixItems": [{"type": "integer"}], "items": {"type": "string"}},
     "tests": [([1, "a", "b"], True), ([1, "a", 2], False), ([1], True), ([], True)]},
    {"description": "items alone", "schema": {"items": {"minimum": 0}},
     "tests": [([0, 1, 2], True), ([0, -1], False), ([], True)]},
    {"description": "contains + min/maxContains", "schema": {"contains": {"type": "string"}, "minContains": 2, "maxContains": 3},
     "tests": [(["a", "b"], True), (["a"], False), (["a", "b", "c", "d"], False), (["a", 1, "b"], True)]},
    {"description": "minContains 0 relaxes contains", "schema": {"contains": {"type": "string"}, "minContains": 0},
     "tests": [([1, 2], True), ([], True)]},
    # ---- object ----
    {"description": "required", "schema": {"required": ["a", "b"]},
     "tests": [({"a": 1, "b": 2}, True), ({"a": 1}, False), ({}, False), (1, True)]},
    {"description": "properties", "schema": {"properties": {"a": {"type": "integer"}}},
     "tests": [({"a": 1}, True), ({"a": "x"}, False), ({"b": "x"}, True), ({}, True)]},
    {"description": "patternProperties", "schema": {"patternProperties": {"^x": {"type": "integer"}}},
     "tests": [({"xa": 1}, True), ({"xa": "s"}, False), ({"ax": "s"}, True)]},
    {"description": "additionalProperties false", "schema": {"properties": {"a": True}, "patternProperties": {"^x": True}, "additionalProperties": False},
     "tests": [({"a": 1, "xb": 2}, True), ({"a": 1, "b": 2}, False), ({}, True)]},
    {"description": "additionalProperties schema", "schema": {"properties": {"a": True}, "additionalProperties": {"type": "integer"}},
     "tests": [({"a": "s", "b": 1}, True), ({"b": "s"}, False)]},
    {"description": "propertyNames", "schema": {"propertyNames": {"maxLength": 2}},
     "tests": [({"ab": 1}, True), ({"abc": 1}, False), ({}, True)]},
    {"description": "min/maxProperties", "schema": {"minProperties": 1, "maxProperties": 2},
     "tests": [({"a": 1}, True), ({}, False), ({"a": 1, "b": 2, "c": 3}, False)]},
    {"description": "dependentRequired", "schema": {"dependentRequired": {"a": ["b"]}},
     "tests": [({"a": 1, "b": 2}, True), ({"a": 1}, False), ({"b": 2}, True), ({}, True)]},
    {"description": "dependentSchemas", "schema": {"dependentSchemas": {"a": {"minProperties": 2}}},
     "tests": [({"a": 1, "b": 2}, True), ({"a": 1}, False), ({"c": 1}, True)]},
    # ---- combinators ----
    {"description": "allOf", "schema": {"allOf": [{"minimum": 0}, {"maximum": 10}]},
     "tests": [(5, True), (-1, False), (11, False)]},
    {"description": "anyOf", "schema": {"anyOf": [{"type": "string"}, {"minimum": 5}]},
     "tests": [("s", True), (6, True), (1, False)]},
    {"description": "oneOf exactly one", "schema": {"oneOf": [{"type": "integer"}, {"minimum": 2}]},
     "tests": [(1, True), (2, False), (2.5, True),
               ("s", True)]},  # minimum is vacuous for strings -> branch 2 valid
    {"description": "oneOf none match", "schema": {"oneOf": [{"type": "integer"}, {"type": "array"}]},
     "tests": [("s", False), (1, True)]},
    {"description": "not", "schema": {"not": {"type": "integer"}},
     "tests": [(1.5, True), (1, False), ("s", True)]},
    {"description": "if/then/else", "schema": {"if": {"exclusiveMaximum": 0}, "then": {"minimum": -10}, "else": {"multipleOf": 2}},
     "tests": [(-1, True), (-100, False), (4, True), (3, False)]},
    {"description": "if without then is annotation-only", "schema": {"if": {"const": 0}},
     "tests": [(0, True), (1, True)]},
    # ---- boolean schemas ----
    {"description": "true schema", "schema": True, "tests": [(1, True), (None, True)]},
    {"description": "false schema", "schema": False, "tests": [(1, False), (None, False)]},
    {"description": "propertyNames false forbids all props", "schema": {"propertyNames": False},
     "tests": [({}, True), ({"a": 1}, False)]},
    # ---- $ref / $defs / $anchor ----
    {"description": "$ref to $defs", "schema": {"$ref": "#/$defs/pos", "$defs": {"pos": {"minimum": 0}}},
     "tests": [(1, True), (-1, False)]},
    {"description": "$ref sibling keywords both apply (2020-12)", "schema": {"$ref": "#/$defs/s", "maxLength": 2, "$defs": {"s": {"type": "string"}}},
     "tests": [("ab", True), ("abc", False), (1, False)]},
    {"description": "$ref by $anchor", "schema": {"$ref": "#thing", "$defs": {"t": {"$anchor": "thing", "type": "integer"}}},
     "tests": [(1, True), ("s", False)]},
    {"description": "nested refs", "schema": {"$ref": "#/$defs/a", "$defs": {"a": {"$ref": "#/$defs/b"}, "b": {"type": "integer"}}},
     "tests": [(3, True), ("x", False)]},
    {"description": "recursive ref (cyclic)", "schema": {
        "$defs": {"node": {"type": "object", "properties": {"v": {"type": "integer"}, "next": {"$ref": "#/$defs/node"}}, "required": ["v"]}},
        "$ref": "#/$defs/node"},
     "tests": [({"v": 1}, True), ({"v": 1, "next": {"v": 2}}, True),
               ({"v": 1, "next": {"x": 2}}, False), ({"v": "s"}, False)]},
    # ---- unevaluated* ----
    {"description": "unevaluatedProperties with allOf", "schema": {
        "allOf": [{"properties": {"a": True}}], "properties": {"b": True},
        "unevaluatedProperties": False},
     "tests": [({"a": 1, "b": 2}, True), ({"a": 1, "c": 2}, False), ({}, True)]},
    {"description": "unevaluatedProperties sees if/then branch", "schema": {
        "if": {"required": ["a"]}, "then": {"properties": {"b": True}},
        "unevaluatedProperties": {"type": "integer"}},
     "tests": [({"a": 1, "b": "s"}, True),      # a,b evaluated (if+then)
               ({"b": "s"}, False),              # if failed: b unevaluated, not int
               ({"b": 3}, True)]},
    {"description": "unevaluatedItems after prefixItems", "schema": {
        "prefixItems": [{"type": "integer"}], "unevaluatedItems": {"type": "string"}},
     "tests": [([1, "a"], True), ([1, 2], False), ([1], True)]},
    {"description": "unevaluatedItems sees contains matches", "schema": {
        "contains": {"type": "string"}, "unevaluatedItems": {"type": "integer"}},
     "tests": [(["a", 1], True), (["a", 1.5], False)]},
    # ---- format (annotation-only by default) ----
    {"description": "format no assertion by default", "schema": {"format": "ipv4"},
     "tests": [("not-an-ip", True), ("1.2.3.4", True)]},
    # ---- metaschema-ish composite ----
    {"description": "composite web-page schema", "schema": {
        "type": "object",
        "required": ["url", "lang"],
        "properties": {
            "url": {"type": "string", "pattern": "^https?://", "maxLength": 50},
            "lang": {"type": "string", "pattern": "^[a-z]{2}$"},
            "tags": {"type": "array", "items": {"type": "string"}, "uniqueItems": True},
        },
        "additionalProperties": False},
     "tests": [({"url": "https://e.x/p", "lang": "en"}, True),
               ({"url": "ftp://e.x", "lang": "en"}, False),
               ({"url": "https://e.x", "lang": "EN"}, False),
               ({"url": "https://e.x", "lang": "en", "tags": ["a", "a"]}, False),
               ({"url": "https://e.x", "lang": "en", "extra": 1}, False)]},
]

FORMAT_CASES = [
    # assert_formats=True cases
    {"description": "format json-pointer", "schema": {"format": "json-pointer"},
     "tests": [("/a/b", True), ("", True), ("a/b", False), ("/a~2b", False), ("/a~0b", True)]},
    {"description": "format ipv4", "schema": {"format": "ipv4"},
     "tests": [("1.2.3.4", True), ("256.1.1.1", False), ("x", False), (5, True)]},
    {"description": "format date-time", "schema": {"format": "date-time"},
     "tests": [("2025-06-01T10:20:30Z", True), ("2025-06-01 10:20:30", False),
               ("2025-06-01T10:20:30+02:00", True)]},
    {"description": "format uuid", "schema": {"format": "uuid"},
     "tests": [("123e4567-e89b-12d3-a456-426614174000", True), ("xyz", False)]},
]

LEGACY_2019_CASES = [
    {"description": "2019-09 tuple items + additionalItems",
     "schema": {"$schema": "https://json-schema.org/draft/2019-09/schema",
                "items": [{"type": "integer"}, {"type": "string"}],
                "additionalItems": {"type": "boolean"}},
     "tests": [([1, "a"], True), ([1, "a", True], True), ([1, "a", 1], False),
               (["x"], False), ([], True)]},
    {"description": "2019-09 single-schema items",
     "schema": {"$schema": "https://json-schema.org/draft/2019-09/schema",
                "items": {"type": "integer"}},
     "tests": [([1, 2], True), ([1, "a"], False)]},
    {"description": "2019-09 unevaluatedItems after tuple items",
     "schema": {"$schema": "https://json-schema.org/draft/2019-09/schema",
                "items": [{"type": "integer"}],
                "unevaluatedItems": {"type": "string"}},
     "tests": [([1, "a"], True), ([1, 2], False)]},
]
