package graft.operators

import graft.SparkSpec

/** Randomized invariants for the TF-IDF integer arithmetic (seeded —
  * fully deterministic). These pin the ADVICE-r13 overflow class shut:
  * for ANY document shape and ANY adversarial idf fit, the clamped
  * weights keep every norm and dot product inside BIGINT (the bound
  * the wCap scaladoc proves; this spec exercises it with extremes the
  * unit tests don't reach).
  */
class TfidfPropertySpec extends SparkSpec {

  import spark.implicits._

  private val rng = new scala.util.Random(1234)

  test("wCap bound: B·wCap(B)² ≤ Long.Max for every bucket count") {
    for (b <- Seq(1, 2, 16, 64, 100, 128, 1024, 4096, 65536)) {
      val cap = Tfidf.wCap(b)
      withClue(s"B=$b cap=$cap: ") {
        (BigInt(b) * BigInt(cap) * BigInt(cap)) should be <= BigInt(Long.MaxValue)
        // and the cap is tight-ish: one more step would overflow
        (BigInt(b) * BigInt(cap + 2) * BigInt(cap + 2)) should
          be > BigInt(Long.MaxValue)
      }
    }
  }

  test("norms and dots never wrap for random docs under adversarial idf fits") {
    for (trial <- 1 to 5) {
      // random docs with heavy repetition (high tf) + an idf fit whose
      // values dwarf the clamp
      val docs = (1L to 6L).map { id =>
        val vocab = 1 + rng.nextInt(8)
        val len = 50 + rng.nextInt(400)
        id -> (0 until len).map(_ => s"w${rng.nextInt(vocab)}").mkString(" ")
      }.toDF("doc_id", "text")
      val hugeIdf = Map(
        Tfidf.UnseenKey -> (Long.MaxValue / (1 + rng.nextInt(1000))))
      val v = Tfidf.hashedVectorsWithIdf(docs, "doc_id", "text", hugeIdf, 64)
      val cap = Tfidf.wCap(64)
      withClue(s"trial $trial: ") {
        v.select("w").collect().foreach(_.getLong(0) should be <= cap)
        Tfidf.squaredNorms(v).collect().foreach { r =>
          r.getAs[Long]("n2") should be > 0L // wrap would go negative
        }
        // dot of every doc with itself = its norm — positive, in range
        val n2 = Tfidf.squaredNorms(v).collect()
          .map(r => r.getAs[Long]("id") -> r.getAs[Long]("n2")).toMap
        n2.values.foreach(x => x should be <= Long.MaxValue)
      }
    }
  }
}
