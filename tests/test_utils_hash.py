"""Driver-side xxhash64 (utils.xxhash64_str) must be bit-identical to
Spark's JVM ``xxhash64`` builtin — it stands in for the JVM hash in
driver-side bucket probes (bm25_topk_streamed's term -> tbucket map), so
a single mismatching string would silently mis-prune partitions."""

import random
import string

from pyspark.sql import functions as F

from pandas_db_spark.utils import xxhash64_str


def test_xxhash64_str_matches_jvm(spark):
    rng = random.Random(14)
    cases = ["", "a", "merge", "vector", "stream", "hello world",
             "ünïcode-テスト☃", "x" * 31, "y" * 32, "z" * 33,
             "w" * 100]  # cover < 32 B, the 32 B stripe loop, and tails
    cases += ["".join(rng.choice(string.printable)
                      for _ in range(rng.randint(0, 90)))
              for _ in range(120)]
    df = spark.createDataFrame([(c,) for c in set(cases)], "s string")
    for r in df.select("s", F.xxhash64("s").alias("h")).collect():
        assert xxhash64_str(r["s"]) == r["h"], repr(r["s"])


def test_xxhash64_str_pmod_bucket(spark):
    # the exact use site: pmod(xxhash64(term), n) == xxhash64_str(t) % n
    terms = ["merge", "vector", "stream", "", "Zipf", "café"]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    rows = df.select("term", F.pmod(F.xxhash64("term"), F.lit(32))
                     .alias("b")).collect()
    for r in rows:
        assert xxhash64_str(r["term"]) % 32 == r["b"]
