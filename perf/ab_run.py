"""One interleaved A/B iteration: time 3 queries from a given repo path
in a fresh JVM. Prints one JSON line."""
import json
import sys
import time

repo = sys.argv[1]
sys.path.insert(0, repo)

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from spark_streaming_with_debezium_spark.registry import load_all

qs = load_all()
sf = "/root/testdata/sf0.1"
names = ["dedup_exact_groups", "fn_json_typed_parse", "dedup_minhash_lsh"]
# one warm-up pass so JVM/codegen startup doesn't pollute the timings
for n in names:
    qs[n].fn(spark, sf).count()
out = {}
for n in names:
    t0 = time.monotonic()
    qs[n].fn(spark, sf).count()
    out[n] = round(time.monotonic() - t0, 3)
print(json.dumps({"repo": repo, "t": out}))
