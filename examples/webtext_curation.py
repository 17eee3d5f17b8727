"""An end-to-end webtext curation pipeline at example scale: the
passes a training-data pipeline chains between crawl and tokenizer —
exact dedup -> corpus-level line dedup (CCNet) -> C4 heuristic
cleaning -> quality gate -> deterministic stratified sampling ->
sequence-packing plan. Every step is pure DataFrame algebra from
jschon_spark.operators; at production scale the identical plan runs
over the full corpus (shuffles only where the semantics require:
line-frequency agg, domain exchange, packing cumsum).
"""

from pyspark.sql import functions as F

from jschon_spark import get_spark
from jschon_spark.operators import dedup, textqa, webtext

spark = get_spark(cores=4)

docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
# plant multi-line text: the word-soup docs are single-line (the
# boilerplate footer lands in ~4/7 of the corpus)
footer = (
    F.when(F.col("doc_id") % 7 < 4, F.lit("all rights reserved"))
    .otherwise(F.concat(F.lit("note "), F.col("doc_id").cast("string")))
)
docs = docs.withColumn(
    "text", F.concat(F.col("text"), F.lit(".\n"), footer)
)

n0 = docs.count()

# 1. exact dedup (normalized text hash)
dup_groups = dedup.exact_duplicate_groups(docs, "doc_id", "text").count()

# 2. CCNet line dedup: shared footers vanish, unique lines survive
lined = webtext.line_dedup(docs, min_docs=30)
n_boiler = lined.filter(F.col("n_kept") < F.col("n_lines")).count()

# 3. C4 cleaning over the deduped text
cleaned = webtext.c4_clean(
    lined.select("doc_id", F.col("text_dedup").alias("text")),
    min_words=5,
)
n_c4 = cleaned.filter("c4_passed").count()

# 4. quality gate on the survivors
quality = textqa.quality_features(
    cleaned.filter("c4_passed").select("doc_id", F.col("text_clean").alias("text")),
    "text",
)
survivors = quality.filter(F.col("n_tokens") >= 30)
n_q = survivors.count()

# 5. deterministic stratified sample (md5-keyed, resumable)
langed = survivors.join(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "lang"),
    "doc_id",
)
sampled = webtext.stratified_sample(
    langed, rates={"en": 0.5}, default_rate=0.2
)
n_s = sampled.count()

# 6. sequence-packing plan for the sampled docs
bins = webtext.pack_token_bins(sampled, budget=512)
n_bins = bins.count()
total_tokens = bins.agg(F.sum("total_tokens")).collect()[0][0]

print("input docs:", n0)
print("exact dup groups:", dup_groups)
print("docs that lost boilerplate lines:", n_boiler)
print("c4 survivors:", n_c4)
print("quality survivors:", n_q)
print("sampled:", n_s)
print("packed bins:", n_bins, "total tokens:", total_tokens)
