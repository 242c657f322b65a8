package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** VecDot must be a drop-in for the interpreted HOF dot product: same
  * bits (sequential double accumulation), same null contract. The HOF
  * reference below is the exact formulation VecDot replaced in
  * operators/Similarity.scala.
  */
class VecDotSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bit-exact parity with the HOF formulation on float vectors") {
    val df = Seq.tabulate(50) { i =>
      (i.toLong, Array.tabulate(64)(j => ((i * 31 + j * 7) % 13 - 6) / 3.0f))
    }.toDF("id", "v")
    val both = df.as("a").crossJoin(df.as("b"))
      .select(
        VecDot(col("a.v"), col("b.v")).as("native"),
        hofDot(col("a.v"), col("b.v")).as("hof"))
      .collect()
    both should have size 2500
    both.foreach { r =>
      java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(1))
    }
  }

  test("null contract: null input, length mismatch, null element") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(3.0f, 4.0f)), // ok: 11.0
      (2L, null, Array(1.0f)),                    // null input
      (3L, Array(1.0f), Array(1.0f, 2.0f))        // length mismatch
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), VecDot(col("a"), col("b")).as("d"))
      .collect()
      .map(r => r.getLong(0) -> Option.when(!r.isNullAt(1))(r.getDouble(1)))
      .toMap
    out(1L) shouldBe Some(11.0)
    out(2L) shouldBe None
    out(3L) shouldBe None
  }

  test("mixed float/double operands (vector vs literal sign array)") {
    val df = Seq((1L, Array(2.0f, -3.0f, 0.5f))).toDF("id", "v")
    val signs = Array(1.0, -1.0, 1.0)
    df.select(VecDot(col("v"), lit(signs)).as("d"))
      .as[Double].head() shouldBe (2.0 + 3.0 + 0.5)
  }

  test("interpreted eval matches codegen (filter pushed to non-codegen path)") {
    // force interpreted evaluation via a literal-only projection evaluated
    // eagerly by constant folding on the driver
    val df = Seq((1L, Array(1.5f, 2.5f))).toDF("id", "v")
    val expected = 1.5f.toDouble * 1.5f.toDouble + 2.5f.toDouble * 2.5f.toDouble
    df.select(VecDot(lit(Array(1.5f, 2.5f)), lit(Array(1.5f, 2.5f))).as("d"))
      .as[Double].head() shouldBe expected
  }

  test("plane signs literal matches the per-row xxhash64 formulation") {
    // the old per-row Rademacher sign: pmod(xxhash64(lit(j), i), 2) == 0
    val dim = 64
    val df = spark.range(1).select(
      (0 until 8).map { j =>
        transform(sequence(lit(0), lit(dim - 1)),
          i => when(pmod(xxhash64(lit(j), i), lit(2)) === 0, lit(1.0))
            .otherwise(lit(-1.0))).as(s"p$j")
      }: _*)
    val rows = df.collect().head
    (0 until 8).foreach { j =>
      import org.apache.spark.sql.catalyst.expressions.XXH64
      val expected = Array.tabulate(dim) { i =>
        val h = XXH64.hashInt(i, XXH64.hashInt(j, 42L))
        if (java.lang.Math.floorMod(h, 2L) == 0L) 1.0 else -1.0
      }
      rows.getSeq[Double](j).toArray shouldBe expected
    }
  }
}
