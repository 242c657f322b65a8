package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (90% of rows) + a long tail
  private def skewed = (1 to 1000).map { i =>
    (if (i <= 900) "hot" else s"k$i", i.toLong)
  }.toDF("k", "v")

  test("saltedAgg matches the plain aggregate exactly") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(skewed, Seq("k"), saltBuckets = 16,
      sum("v").as("sum_v") -> sum("sum_v").as("sum_v"),
      count(lit(1)).as("n") -> sum("n").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    salted shouldBe plain
  }

  test("saltedAgg phase 1 actually spreads the hot key") {
    val salted = skewed.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(16)))
    val groups = salted.filter($"k" === "hot")
      .select("__salt").distinct().count()
    groups should be > 4L // hot key split across many salt buckets
  }

  test("countDistinctSpread matches countDistinct") {
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 9)).toDF("k", "u")
    val out = Skew.countDistinctSpread(df, Seq("k"), "u")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out shouldBe Map("a" -> 2L, "b" -> 1L)
  }

  test("saltedJoin equals the plain join result") {
    val dims = Seq(("hot", "H"), ("k950", "T")).toDF("k", "label")
    val plain = skewed.join(dims, "k").groupBy("label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(skewed, dims, "k", 8).groupBy("label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    salted shouldBe plain
    plain("H") shouldBe 900L
  }
}
