"""Dynamic-key JSON validated entirely JVM-side (round-4 features).

Schema-valued ``patternProperties`` and a compound ``const`` lower
onto Spark 4's VariantType — the object casts to map<string, variant>
and the subschemas evaluate over regex-matched entries with
higher-order functions, so even documents whose KEY NAMES are data
never leave whole-stage codegen. (Reference semantics:
jschon/vocabulary/applicator.py patternProperties; re-expressed
Spark-first.)
"""

from jschon_spark import ConstraintEngine, get_spark

spark = get_spark(cores=4)

engine = ConstraintEngine()
compiled = engine.compile({
    "$id": "https://example.com/metric-bag",
    "type": "object",
    "patternProperties": {
        "^metric_": {"type": "number", "minimum": 0},
        "^tag_": {"type": "string"},
    },
    "properties": {"meta": {"const": {"v": 1}}},
    "additionalProperties": False,
})

docs = [
    '{"metric_cpu": 0.93, "tag_host": "web-1", "meta": {"v": 1}}',
    '{"metric_cpu": -5, "meta": {"v": 1}}',
    '{"metric_cpu": 1, "meta": {"v": 2}}',
    '{"rogue_key": 1, "meta": {"v": 1}}',
    '{"tag_host": 7, "meta": {"v": 1}}',
]
df = spark.createDataFrame([(d,) for d in docs], "doc string")

out = compiled.apply_json(df, "doc")
plan_has_python = any(
    tag in out._jdf.queryExecution().executedPlan().toString()
    for tag in ("ArrowEvalPython", "BatchEvalPython")
)
print("python in plan:", plan_has_python)

for r in sorted(out.collect(), key=lambda r: docs.index(r.doc)):
    viols = sorted((v.keyword, v.instance_path) for v in (r.violations or []))
    print(r.passed, viols)
