"""Recursive schema extension with $dynamicRef / $dynamicAnchor
(functional mirror of the reference's
examples/recursive_schema_extension.py, Spark-first: both schemas
validate a column of tree documents).

``tree`` is an extensible tree; ``strict-tree`` extends it by
forbidding unevaluated properties EVERYWHERE in the tree — the
``$dynamicRef: "#node"`` inside ``tree`` rebinds to the outermost
resource that declares the ``node`` dynamic anchor.
"""

import json

from jschon_spark import ConstraintEngine, get_spark

tree_schema = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "$id": "https://example.com/tree",
    "$dynamicAnchor": "node",
    "type": "object",
    "properties": {
        "data": True,
        "children": {"type": "array", "items": {"$dynamicRef": "#node"}},
    },
}

strict_tree_schema = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "$id": "https://example.com/strict-tree",
    "$dynamicAnchor": "node",
    "$ref": "tree",
    "unevaluatedProperties": False,
}

docs = [
    {"data": 1, "children": [{"data": 2}]},
    {"data": 1, "children": [{"daat": 2}]},  # "daat" is a typo
]

spark = get_spark(cores=4)
engine = ConstraintEngine()
tree = engine.compile(tree_schema)
strict = engine.compile(strict_tree_schema)

df = spark.createDataFrame(
    [(json.dumps(d, sort_keys=True),) for d in docs], "doc string"
)
for name, compiled in (("tree", tree), ("strict-tree", strict)):
    for r in sorted(compiled.apply_json(df, "doc").collect(), key=lambda r: r.doc):
        print(name, r.doc, r.passed)
