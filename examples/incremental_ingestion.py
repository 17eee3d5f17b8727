"""Daily-ingestion dedup at example scale: the shape a crawl pipeline
runs every day — normalize the incoming batch, flag what already
exists in the historical corpus (exact via 16-byte hash reduction,
near via simhash pigeonhole bands), and append only the novel
documents. At production scale the identical plan runs with the
history side never moving: only hashes ride the exchanges.
"""

from pyspark.sql import functions as F

from jschon_spark import get_spark
from jschon_spark.operators import dedup, textqa

spark = get_spark(cores=4)

docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

# history = even ids; today's batch = odd ids + a re-crawled slice of
# history (upper-cased and re-whitespaced, as mirrors do)
history = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
recrawled = history.filter(F.col("doc_id") % 10 == 0).select(
    (F.col("doc_id") + 1_000_000).alias("doc_id"),
    F.upper(F.concat(F.lit("  "), F.col("text"))).alias("text"),
)
batch = (
    docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    .unionByName(recrawled)
)

# 0. canonicalize before hashing (NFC — NFD twins defeat exact dedup)
nfc = textqa.nfc_features(batch)
n_changed = nfc.filter("nfc_changed").count()
print(f"batch: {batch.count()} docs, nfc-changed: {n_changed}")

# 1. flag against history: exact + simhash near pass
flagged = dedup.dedup_against_corpus(
    batch, history, near_simhash_max_hamming=3
)
n_exact = flagged.filter("is_exact_dup").count()
n_near = flagged.filter("is_near_dup AND NOT is_exact_dup").count()
novel = flagged.filter("NOT is_exact_dup AND NOT is_near_dup")
print(f"exact dups vs history: {n_exact}")
print(f"near-only dups vs history: {n_near}")
print(f"novel docs appended: {novel.count()}")

# 2. the appended slice keeps the batch's own columns
print(f"appended columns: {novel.drop('is_exact_dup', 'is_near_dup').columns}")
