"""Loading schemas from files with cross-file $ref resolution
(functional mirror of the reference's examples/load_from_files_*.py,
Spark-first: the loaded schema validates a whole DataFrame of
documents instead of one instance).

``org-schema.json`` $refs ``person`` relative to its own $id; the
catalog routes the ``https://example.com/schemas/`` prefix to a
LocalSource over examples/data (suffix ``-schema.json``), exactly like
jschon's LocalSource routing.
"""

import json
import pathlib

from jschon_spark import ConstraintEngine, get_spark

data_dir = pathlib.Path(__file__).parent / "data"

spark = get_spark(cores=4)
engine = ConstraintEngine()
engine.catalog.add_local_source(
    "https://example.com/schemas/", str(data_dir), suffix="-schema.json"
)

with open(data_dir / "org-schema.json", encoding="utf-8") as f:
    org_schema = json.load(f)
compiled = engine.compile(org_schema)

with open(data_dir / "org-data.json", encoding="utf-8") as f:
    orgs = json.load(f)
df = spark.createDataFrame(
    [(json.dumps(o, sort_keys=True),) for o in orgs], "doc string"
)

out = compiled.apply_json(df, "doc")
for r in sorted(out.collect(), key=lambda r: r.doc):
    viols = sorted((v.keyword, v.instance_path) for v in (r.violations or []))
    print(json.loads(r.doc).get("orgName"), r.passed, viols)
