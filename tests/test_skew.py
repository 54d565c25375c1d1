"""AQE skew handling: a hot-key sort-merge join must get runtime
skew-split (the engine's second line of defense after explicit salting
— session.py enables spark.sql.adaptive.skewJoin)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark, tmp_path):
    conf = spark.conf
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    )
    saved = {k: conf.get(k) for k in keys}
    try:
        # force a sort-merge join and make the skew detector fire on
        # sandbox-sized data (thresholds scaled down, same mechanism)
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

        # 90% of fact rows share one hot key (a boilerplate-heavy domain)
        fact = spark.range(1_000_000).select(
            F.when(F.col("id") % 10 != 0, F.lit("hot")).otherwise(
                F.concat(F.lit("k"), (F.col("id") % 997).cast("string"))
            ).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        fact.write.mode("overwrite").parquet(str(tmp_path / "fact"))
        dim = spark.range(2000).select(
            F.when(F.col("id") == 0, F.lit("hot")).otherwise(
                F.concat(F.lit("k"), (F.col("id") % 997).cast("string"))
            ).alias("k")
        ).distinct().withColumn("attr", F.length("k"))
        dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))

        f2 = spark.read.parquet(str(tmp_path / "fact"))
        d2 = spark.read.parquet(str(tmp_path / "dim"))
        j = f2.join(d2, "k").select("k", "payload", "attr")
        j.foreach(lambda r: None)  # executes THIS dataset's plan (AQE finalizes)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]

        # and the answer is right under the split
        n_hot = j.where("k = 'hot'").count()
        assert n_hot == 900_000
    finally:
        for k, v in saved.items():
            conf.set(k, v)
