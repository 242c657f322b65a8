package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (a even positions, b odd)") {
    val df = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (0xFFFFFFFFL, 0L), (0L, 0xFFFFFFFFL), (5L, 3L)
    ).toDF("a", "b")
    val out = df.select(Layout.zValue($"a", $"b").as("z"))
      .as[Long].collect()
    out(0) shouldBe 0L
    out(1) shouldBe 1L                    // a bit 0 → z bit 0
    out(2) shouldBe 2L                    // b bit 0 → z bit 1
    out(3) shouldBe 3L
    out(4) shouldBe 0x5555555555555555L   // a fills even bits
    out(5) shouldBe 0xAAAAAAAAAAAAAAAAL   // b fills odd bits
    // 5 = 101, 3 = 011 → z = b2 a2 b1 a1 b0 a0 = 0 1 1 0 1 1 = 27? no:
    // even bits from a(101): bits 0,4 set → 0b010001; odd bits from
    // b(011): bits 1,3 set → 0b001010; OR = 0b011011 = 27
    out(6) shouldBe 27L
  }

  test("zorderBy clusters both dimensions within output partitions") {
    // a 32×32 grid: after z-ordering into 16 partitions, each partition's
    // bounding box in (x, y) must be far smaller than the full grid —
    // that tightness is exactly what makes parquet min/max stats prune
    val grid = (0 until 32).flatMap(x => (0 until 32).map(y => (x, y)))
      .toDF("x", "y")
    val parts = Layout.zorderBy(grid, "x", "y", partitions = 16)
      .select(spark_partition_id().as("p"), $"x", $"y")
      .groupBy("p")
      .agg((max($"x") - min($"x")).as("dx"), (max($"y") - min($"y")).as("dy"),
        count(lit(1)).as("n"))
      .collect()
    parts.map(_.getAs[Long]("n")).sum shouldBe 1024L
    // a z-ordered 64-row slice of a 32×32 grid covers at most a 16×16 box
    // (one level of the quadtree + boundary slack); a single-column sort
    // would give dx=0 but dy=31 for every slice
    val nonTrivial = parts.filter(_.getAs[Long]("n") >= 32)
    nonTrivial should not be empty
    for (r <- nonTrivial) {
      r.getAs[Int]("dx") should be <= 16
      r.getAs[Int]("dy") should be <= 16
    }
  }

  test("zorderByApprox preserves rows and needs no global window") {
    val df = (0 until 500).map(i => (i.toLong, (i * 37 % 500).toLong))
      .toDF("a", "b")
    val out = Layout.zorderByApprox(df, "a", "b", partitions = 4,
      buckets = 256)
    out.count() shouldBe 500L
    out.columns.sorted shouldBe Array("a", "b")
    // constant column degenerates to bucket 0 without erroring
    Layout.zorderByApprox(df.withColumn("b", lit(7L)), "a", "b", 2, 16)
      .count() shouldBe 500L
  }

  test("zorderByApprox: column-max rows land in the TOP bucket, not z≈0") {
    // width_bucket returns buckets+1 at the column max; pre-clamp, the
    // max rows needed bits+1 bits and wrapped to the LOW end of the
    // layout. With the clamp, (max, max) must sort after (0, 0).
    val df = (0 to 100).map(i => (i.toLong, i.toLong)).toDF("a", "b")
    val pid = Layout.zorderByApprox(df, "a", "b", partitions = 2,
      buckets = 16)
      .withColumn("pid", spark_partition_id())
      .select("a", "pid").as[(Long, Int)].collect().toMap
    pid(100L) should be > pid(0L)
  }

  test("zorderByQuantile: balanced partitions on a log-normal column where equi-width degrades") {
    // exp(i/400) over 8000 rows: the top value stretches the equi-width
    // range until ~72% of rows share bucket 0 — that partition's file
    // would span most of the domain and never prune. Quantile cut points
    // hold ~equal row counts regardless of skew.
    val df = (0 until 8000).map(i => (math.exp(i / 400.0), 1L))
      .toDF("skewed", "k")
    def partStats(out: org.apache.spark.sql.DataFrame) =
      out.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(count(lit(1)).as("n"), min("skewed").as("lo"), max("skewed").as("hi"))
        .collect()
    val q = partStats(Layout.zorderByQuantile(df, "skewed", "k", partitions = 4))
    val w = partStats(Layout.zorderByApprox(df, "skewed", "k", partitions = 4,
      buckets = 256))
    q.map(_.getAs[Long]("n")).sum shouldBe 8000L
    // equi-width: one fat partition holds the bucket-0 mass
    w.map(_.getAs[Long]("n")).max.toDouble / 8000 should be >= 0.6
    // quantile: no partition much above the balanced quarter share
    q.map(_.getAs[Long]("n")).max.toDouble / 8000 should be <= 0.35
    // and the per-partition [min,max] ranges barely overlap (tight stats)
    val ranges = q.map(r => (r.getAs[Double]("lo"), r.getAs[Double]("hi")))
    val overlapping = ranges.combinations(2).count {
      case Array((lo1, hi1), (lo2, hi2)) => lo1 < hi2 && lo2 < hi1
    }
    overlapping shouldBe 0
  }

  test("zorderByApprox: all-null and partly-null columns don't error") {
    val df = (0 until 50).map(i => (i.toLong, i.toLong)).toDF("a", "b")
    // all-null column → min/max are null → bucket 0 (pre-fix: NPE)
    Layout.zorderByApprox(df.withColumn("b", lit(null).cast("long")),
      "a", "b", 2, 16).count() shouldBe 50L
    // per-row nulls bin to bucket 0, rows preserved
    val mixed = df.withColumn("b",
      when(col("a") % 2 === 0, col("b")))
    Layout.zorderByApprox(mixed, "a", "b", 2, 16).count() shouldBe 50L
  }

  test("quantileBucket: nulls bin to bucket 0, as on the approx path") {
    // Pre-fix, a null value fell through every when-branch of the
    // binary-search tree (null `<` comparisons take the otherwise arm)
    // and landed in the TOP bucket, contradicting zorderByApprox.
    val bounds = Array(10.0, 20.0, 30.0)
    val df = Seq[java.lang.Long](null, 5L, 10L, 25L, 99L).toDF("v")
    df.select(Layout.quantileBucket(col("v"), bounds).as("b"))
      .as[Long].collect() shouldBe Array(0L, 0L, 1L, 2L, 3L)
    // empty bounds (all-null column → empty sketch) → everything bucket 0
    df.select(Layout.quantileBucket(col("v"), Array.empty[Double]).as("b"))
      .as[Long].collect() shouldBe Array(0L, 0L, 0L, 0L, 0L)
    // end-to-end: an all-null column doesn't error and preserves rows
    val wide = (0 until 64).map(i => (i.toLong, i.toLong)).toDF("a", "b")
    Layout.zorderByQuantile(
      wide.withColumn("b", lit(null).cast("long")), "a", "b", 2, 8)
      .count() shouldBe 64L
  }
}
