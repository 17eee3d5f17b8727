"""ConstraintEngine — the public compile/apply API.

Reference analogue: ``create_catalog()`` + ``JSONSchema(...)`` +
``schema.evaluate(JSON(instance))``
(/root/reference/jschon/__init__.py:27-53,
/root/reference/jschon/jsonschema.py:27-125,191-220), reshaped for
Spark: compile once on the driver, choose a lowering, evaluate a whole
DataFrame per call.

Lowering choice:
  1. typed rows → pure Column expressions (whole-stage codegen) when
     every keyword lowers;
  2. otherwise → vectorized Arrow batch evaluator over the row
     re-serialized as JSON (or a native JSON string column).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jschon_spark.lowering.batch import validate_json_column
from jschon_spark.lowering.columns import CannotLower, ColumnLowerer, VIOLATION_DDL
from jschon_spark.schema.catalog import SchemaCatalog


class CompiledSchema:
    """A schema compiled against the engine's catalog."""

    def __init__(
        self,
        schema: Any,
        catalog: SchemaCatalog,
        base_uri: str,
        assert_formats: bool = False,
    ) -> None:
        self.schema = schema
        self.catalog = catalog
        self.base_uri = base_uri
        self.assert_formats = assert_formats
        self._store = [schema]
        # lowered-Column memo (round 7): Column trees are immutable
        # expression handles independent of any particular DataFrame,
        # and building them costs hundreds of py4j round-trips
        # (~0.5s per apply on the flagship schemas). Within one
        # CompiledSchema the catalog is fixed, so lowering is a pure
        # function of (dtype, doc column layout) — compile once, apply
        # many, the reference's own architecture.
        self._typed_cache: dict = {}
        self._json_cache: dict = {}

    # -- typed path ---------------------------------------------------------
    def lower_columns(
        self, dtype: T.DataType, col: Column
    ) -> tuple[Column, Column]:
        """(valid, violations) Columns for a typed value; raises
        CannotLower if any keyword is outside the expression subset."""
        lowerer = ColumnLowerer(self.catalog, self.assert_formats)
        return lowerer.lower(self.schema, dtype, col, self.base_uri)

    def apply_typed(
        self,
        df: DataFrame,
        doc_cols: list[str] | None = None,
        keep_cols: list[str] | None = None,
    ) -> DataFrame:
        """Validate each row (as a JSON object of ``doc_cols``) and add
        ``passed:boolean`` + ``violations:array<struct>``.

        Falls back to the batch evaluator (row re-serialized with
        ``to_json``) when column lowering is impossible.
        """
        doc_cols = doc_cols or df.columns
        struct_type = T.StructType(
            [df.schema[c] for c in doc_cols]
        )
        row = F.struct(*[F.col(c) for c in doc_cols])
        key = (struct_type.simpleString(), tuple(doc_cols))
        hit = self._typed_cache.get(key)
        if hit is None:
            try:
                hit = self.lower_columns(struct_type, row)
            except CannotLower:
                hit = CannotLower
            self._typed_cache[key] = hit
        if hit is not CannotLower:
            valid, viols = hit
            return df.withColumn("passed", valid).withColumn(
                "violations", viols.cast(VIOLATION_DDL)
            )
        with_json = df.withColumn("__doc", F.to_json(row))
        out = validate_json_column(
            with_json, "__doc", self.schema, self._store, self.assert_formats
        )
        return out.drop("__doc")

    # -- dynamic JSON path ----------------------------------------------------
    def apply_json(
        self, df: DataFrame, json_col: str, prefer_variant: bool = True
    ) -> DataFrame:
        """Validate a column of JSON documents.

        Flat schemas lower onto Spark 4 VariantType — the whole
        validation stays JVM-side even for dynamic JSON. Anything the
        variant subset can't express falls back to the Arrow batch
        evaluator (full keyword coverage).
        """
        if prefer_variant:
            from jschon_spark.lowering.variant import (
                VariantLowerer,
            )

            key = (json_col, self.base_uri)
            hit = self._json_cache.get(key)
            if hit is None:
                lowerer = VariantLowerer(self.catalog, self.assert_formats)
                try:
                    hit = lowerer.lower(
                        self.schema, F.col(json_col),
                        F.col("__variant_doc"), self.base_uri,
                    )
                except CannotLower:
                    hit = CannotLower
                self._json_cache[key] = hit
            if hit is not CannotLower:
                passed, violations = hit
                # parse materialized as its own projection so every
                # keyword references the variant COLUMN (parsed once —
                # see lowering/variant.validate_json_column_variant)
                return (
                    df.withColumn(
                        "__variant_doc", F.try_parse_json(F.col(json_col))
                    )
                    .withColumn("passed", passed)
                    .withColumn("violations", violations)
                    .drop("__variant_doc")
                )
        return validate_json_column(
            df, json_col, self.schema, self._store, self.assert_formats
        )

    # -- output shapes (≅ jschon output formats, output.py:39-165) ------------
    @staticmethod
    def verdicts(validated: DataFrame, id_col: str) -> DataFrame:
        """``flag`` format: one row per document."""
        return validated.select(id_col, "passed")

    @staticmethod
    def violations_table(validated: DataFrame, id_col: str) -> DataFrame:
        """``basic`` format: one row per violation."""
        return (
            validated.filter(~F.col("passed"))
            .select(id_col, F.explode("violations").alias("v"))
            .select(
                id_col,
                F.col("v.keyword").alias("keyword"),
                F.col("v.instance_path").alias("instance_path"),
                F.col("v.keyword_path").alias("keyword_path"),
                F.col("v.value").alias("value"),
                F.col("v.error").alias("error"),
            )
        )

    @staticmethod
    def partition_verdicts(
        validated: DataFrame, partition_col: Column | str
    ) -> DataFrame:
        """Per-partition rollup: n_docs, n_failed, passed (all docs ok).

        jschon analogue: the root Result.valid aggregated
        (/root/reference/jschon/jsonschema.py:486-488) — one groupBy
        with map-side combine; shuffle carries one row per partition.
        """
        pc = F.col(partition_col) if isinstance(partition_col, str) else partition_col
        return (
            validated.groupBy(pc.alias("partition"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.when(~F.col("passed"), 1).otherwise(0)).alias("n_failed"),
            )
            .withColumn("passed", F.col("n_failed") == 0)
        )


class ConstraintEngine:
    """Driver-side compiler: register schemas, compile, evaluate."""

    def __init__(self, assert_formats: bool = False) -> None:
        self.catalog = SchemaCatalog()
        self.assert_formats = assert_formats

    def register(self, schema: Any, uri: str | None = None) -> str:
        return self.catalog.register(schema, uri)

    def compile(
        self, schema: Any, uri: str | None = None, validate_schema: bool = True
    ) -> CompiledSchema:
        if validate_schema:
            # the engine validates its own input with itself, mirroring
            # metaschema validation at JSONSchema construction
            # (/root/reference/jschon/jsonschema.py:187-189)
            from jschon_spark.schema.metaschema import validate_schema_document

            validate_schema_document(schema)
        base = self.catalog.register(schema, uri)
        compiled = CompiledSchema(
            schema, self.catalog, base, self.assert_formats
        )
        # ship every registered resource to executors for $ref targets
        compiled._store = list(
            {id(s): s for s in self.catalog._resources.values()}.values()
        )
        return compiled
