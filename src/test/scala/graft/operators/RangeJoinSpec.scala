package graft.operators

import graft.SparkSpec

/** Interval join: inclusive bounds, per-key isolation, bucket-boundary
  * straddling, and the equi-join (not nested-loop) plan.
  */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private def points = Seq(
    ("k1", 5L, 100L), ("k1", 10L, 101L), ("k1", 15L, 102L),
    ("k2", 10L, 103L)
  ).toDF("k", "p", "pid")

  private def intervals = Seq(
    ("k1", 4L, 10L, 200L),   // catches p=5 and p=10 (inclusive end)
    ("k1", 12L, 30L, 201L),  // straddles buckets at width 10; catches p=15
    ("k2", 0L, 50L, 202L)
  ).toDF("k", "s", "e", "iid")

  test("inclusive containment per key; straddling intervals still match") {
    val out = RangeJoin.intervalJoin(points, intervals, Seq("k"),
        "p", "s", "e", bucketWidth = 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    out shouldBe Set((100L, 200L), (101L, 200L), (102L, 201L), (103L, 202L))
  }

  test("a long interval matches many points, each exactly once") {
    val pts = Seq.tabulate(25)(i => ("k", i.toLong, i.toLong)).toDF("k", "p", "pid")
    val ivs = Seq(("k", 3L, 17L, 1L)).toDF("k", "s", "e", "iid")
    val got = RangeJoin.intervalJoin(pts, ivs, Seq("k"), "p", "s", "e", 5L)
      .select("pid").as[Long].collect().sorted
    got shouldBe (3L to 17L).toArray // no duplicate matches despite 4 buckets
  }

  test("plan: equi-join on (key, bucket), no nested loop") {
    val plan = RangeJoin.intervalJoin(points, intervals, Seq("k"),
        "p", "s", "e", 10L).queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }
}
