package graft.core

import graft.SparkSpec
import graft.operators.{Dedup, Similarity}

/** Cache lifecycle: every persist() an operator takes during a scoped
  * build+action is released when the scope exits — the long-lived-session
  * guarantee (Orchestrator/BatchRunner run many curated jobs in ONE
  * session; pre-scope, each near-dup call leaked its shingle/band/
  * candidate caches forever).
  */
class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  private def cachedRddIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog by the river"),
    (2L, "the quick brown fox jumps over the lazy dog by the river"),
    (3L, "an altogether different sentence about compilers and parsers"),
    (4L, "yet another unrelated document mentioning gardens and rain")
  ).toDF("doc_id", "text")

  test("scoped near-dup removal releases every cache it created") {
    val before = cachedRddIds
    val survivors = CacheScope.scoped {
      Dedup.dropNearDuplicates(docs, "doc_id", "text")
        .select("doc_id").as[Long].collect().sorted
    }
    survivors shouldBe Array(1L, 3L, 4L)
    (cachedRddIds -- before) shouldBe empty
  }

  test("scoped embedding near-dup releases every cache it created") {
    val dim = 8
    def vec(seed: Int) = Array.tabulate(dim)(i =>
      math.sin(seed * 31 + i).toFloat)
    val batch = Seq((1L, vec(1)), (2L, vec(1)), (3L, vec(7)))
      .toDF("doc_id", "emb")
    val before = cachedRddIds
    val n = CacheScope.scoped {
      Similarity.cosineNearDupPairs(batch, "doc_id", "emb", 0.95,
        planes = 4, tables = 2, dim = dim).count()
    }
    n shouldBe 1L // (1,2) identical
    (cachedRddIds -- before) shouldBe empty
  }

  test("nested scopes release independently; outer keeps working") {
    val before = cachedRddIds
    CacheScope.scoped {
      val outer = CacheScope.persist(docs.select("doc_id"))
      CacheScope.scoped {
        CacheScope.persist(docs.select("text")).count() shouldBe 4L
      }
      // inner released, outer still cached and readable
      outer.count() shouldBe 4L
      outer.storageLevel.useMemory shouldBe true
    }
    (cachedRddIds -- before) shouldBe empty
  }

  test("unscoped persists are tracked and releasable via releaseAll") {
    val before = cachedRddIds
    val p = CacheScope.persist(docs.select("doc_id"))
    p.count() shouldBe 4L
    CacheScope.releaseAll()
    (cachedRddIds -- before) shouldBe empty
    // post-release re-read recomputes instead of failing
    p.count() shouldBe 4L
    CacheScope.releaseAll() // idempotent
  }

  test("checkpoint truncates the plan and is releasable (unlike localCheckpoint)") {
    val before = cachedRddIds
    val out = CacheScope.scoped {
      val cp = CacheScope.checkpoint(docs.select("doc_id"))
      // plan-truncated: the checkpointed frame reads an RDD leaf, not the
      // original plan tree
      cp.queryExecution.analyzed.collectLeaves().toString should
        (include("ExternalRDD") or include("LogicalRDD"))
      cp.as[Long].collect().sorted
    }
    out shouldBe Array(1L, 2L, 3L, 4L)
    (cachedRddIds -- before) shouldBe empty
  }

  test("unscoped registry auto-compacts entries already unpersisted") {
    CacheScope.releaseAll() // start from a clean registry
    val dead = CacheScope.persist(docs.select("doc_id"))
    dead.count() shouldBe 4L
    dead.unpersist(blocking = true) // caller released it directly
    CacheScope.unscopedSize shouldBe 1 // stale entry still registered...
    val live = CacheScope.persist(docs.select("text"))
    live.count() shouldBe 4L
    // ...but the next registration compacted it away: only the live frame
    // remains, so bare use in a long-lived session stays bounded by the
    // number of LIVE caches, not total persist() calls ever made.
    CacheScope.unscopedSize shouldBe 1
    CacheScope.releaseAll()
    CacheScope.unscopedSize shouldBe 0
  }

  test("guardCount: exact count (doubles as cache materialization)") {
    val df = spark.range(100).toDF("id")
    Dedup.guardCount(df) shouldBe 100L
    Dedup.guardCount(df.filter("id < 0")) shouldBe 0L
  }
}
