package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Randomized parity: the map-side signature kernels must be
  * bit-identical to the explode+aggregate Column formulations they
  * replaced, across random texts including unicode, odd whitespace,
  * empty and single-token documents — the kernels' correctness story is
  * exact replay, so fuzz the replay.
  */
class SignatureKernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(1234)
  private val vocab = Seq("alpha", "Beta", "GAMMA", "ärger", "été", "ß",
    "word", "的话", "x1", "2x", "a", "", "  ", "\ttabbed")

  private def randomText(): String = {
    val n = rng.nextInt(30)
    (0 until n).map(_ => vocab(rng.nextInt(vocab.length)))
      .mkString(if (rng.nextBoolean()) " " else "  ")
  }

  private val docs =
    (1L to 60L).map(i => (i, randomText())).toDF("id", "text")

  test("SimhashBits matches the Custom explode+agg path on random text") {
    def table(h: Dedup.SimhashHasher, bits: Int) =
      Dedup.simhashTable(docs, "id", "text", bits, h)
        .as[(Long, Long)].collect().toMap
    table(Dedup.SimhashHasher.Xx, 64) shouldBe
      table(Dedup.SimhashHasher.Custom(xxhash64(_)), 64)
    table(Dedup.SimhashHasher.Md5_60, 60) shouldBe
      table(Dedup.SimhashHasher.Custom(Dedup.md5Hash60), 60)
  }

  test("MinhashBands matches the legacy aggregate formulation on random text") {
    val (bands, rpb) = (8, 4)
    val k = bands * rpb
    val sh = docs.select($"id", Dedup.wordShingles($"text", 3).as("sh"))
      .filter(org.apache.spark.sql.functions.size($"sh") > 0)
    val kernel = sh.select($"id",
      explode(MinhashBands($"sh", bands, rpb)).as("bk"))
      .as[(Long, Long)].collect().sorted
    val exploded = sh.select($"id", explode($"sh").as("s"))
      .select($"id", xxhash64($"s").as("h"))
    val minAggs = (0 until k).map(i => min(xxhash64($"h", lit(i))).as(s"m$i"))
    val sig = exploded.groupBy("id").agg(minAggs.head, minAggs.tail: _*)
    val bandCols = (0 until bands).map { b =>
      val slice = (b * rpb until (b + 1) * rpb).map(i => col(s"m$i"))
      xxhash64(array(slice: _*), lit(b))
    }
    val legacy = sig.select($"id", explode(array(bandCols: _*)).as("bk"))
      .as[(Long, Long)].collect().sorted
    kernel shouldBe legacy
  }

  test("TextShinglesHashed matches per-size TextShinglesAll + xxhash64/length on random text") {
    val ns = Seq(2, 3, 5, 9)
    val fused = docs.select($"id",
        explode(TextShinglesHashed($"text", ns)).as("s"))
      .select($"id", $"s.n", $"s.h", $"s.len")
      .as[(Long, Int, Long, Long)].collect().sorted
    val unfused = ns.map { n =>
      docs.select($"id", explode(TextShinglesAll($"text", n)).as("g"))
        .select($"id", lit(n).as("n"), xxhash64($"g").as("h"),
          org.apache.spark.sql.functions.length($"g").cast("long").as("len"))
        .as[(Long, Int, Long, Long)].collect()
    }.reduce(_ ++ _).sorted
    fused shouldBe unfused
  }
}
