package graft.operators

import graft.SparkSpec

/** As-of join: inclusive match at equal times, per-key isolation,
  * null before the first quote, tie-break determinism, struct-atomic
  * value attachment, and the single-shuffle plan.
  */
class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  private def probes = Seq(
    ("u1", 10L, 1L), ("u1", 20L, 2L), ("u1", 5L, 3L),
    ("u2", 15L, 4L)
  ).toDF("k", "t", "probe_id")

  private def quotes = Seq(
    ("u1", 8L, 1.0, 100L), ("u1", 20L, 2.0, 101L), ("u1", 30L, 3.0, 102L),
    ("u2", 1L, 9.0, 103L)
  ).toDF("k", "t", "v", "qid")

  test("latest quote at or before each probe, per key, null before first") {
    val out = AsofJoin.asofJoin(probes, quotes, Seq("k"), "t", "t",
        rightVals = Seq("t", "v"), tieBreak = Seq("qid"))
      .collect().map(r => r.getLong(2) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    out(1L) shouldBe ((Some(8L), Some(1.0)))   // u1@10 → quote@8
    out(2L) shouldBe ((Some(20L), Some(2.0)))  // u1@20 → quote@20 (inclusive)
    out(3L) shouldBe ((None, None))            // u1@5 → before any quote
    out(4L) shouldBe ((Some(1L), Some(9.0)))   // u2 isolated from u1 quotes
  }

  test("simultaneous quotes resolve by tie-break, values stay row-atomic") {
    val p = Seq(("u", 10L, 1L)).toDF("k", "t", "probe_id")
    val q = Seq(("u", 10L, 1.0, 1L), ("u", 10L, 2.0, 2L))
      .toDF("k", "t", "v", "qid")
    val r = AsofJoin.asofJoin(p, q, Seq("k"), "t", "t",
        rightVals = Seq("v", "qid"), tieBreak = Seq("qid")).collect()(0)
    r.getDouble(3) shouldBe 2.0 // highest qid wins…
    r.getLong(4) shouldBe 2L    // …and both attached fields are from IT
  }

  test("plan: one Exchange, no broadcast-nested-loop or cartesian") {
    val plan = AsofJoin.asofJoin(probes, quotes, Seq("k"), "t", "t",
        rightVals = Seq("v"), tieBreak = Seq("qid"))
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 1
  }
}
