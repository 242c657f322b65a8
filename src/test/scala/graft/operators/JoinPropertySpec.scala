package graft.operators

import graft.SparkSpec

/** Randomized cross-checks of the as-of and interval joins against
  * in-memory brute-force references (seeded — deterministic). Small
  * keyspaces and time ranges force heavy collisions, equal-time ties,
  * and bucket-boundary cases.
  */
class JoinPropertySpec extends SparkSpec {

  import spark.implicits._

  private val rng = new scala.util.Random(7)

  test("asofJoin equals the brute-force latest-quote-at-or-before") {
    for (_ <- 1 to 5) {
      val probes = (0 until 30).map(i =>
        (s"k${rng.nextInt(4)}", rng.nextInt(40).toLong, i.toLong))
      val quotes = (0 until 25).map(i =>
        (s"k${rng.nextInt(4)}", rng.nextInt(40).toLong, rng.nextDouble(), i.toLong))
      val got = AsofJoin.asofJoin(
          probes.toDF("k", "t", "probe_id"),
          quotes.toDF("k", "t", "v", "qid"),
          Seq("k"), "t", "t", rightVals = Seq("v", "qid"),
          tieBreak = Seq("qid"))
        .collect()
        .map(r => r.getLong(2) ->
          Option(r.get(4)).map(_.asInstanceOf[Long])).toMap
      val expected = probes.map { case (k, pt, pid) =>
        val eligible = quotes.filter(q => q._1 == k && q._2 <= pt)
        // latest time; ties by highest tie-break id
        pid -> eligible.sortBy(q => (q._2, q._4)).lastOption.map(_._4)
      }.toMap
      got shouldBe expected
    }
  }

  test("intervalJoin equals the brute-force containment filter") {
    for (_ <- 1 to 5) {
      val width = 1L + rng.nextInt(12)
      val points = (0 until 40).map(i =>
        (s"k${rng.nextInt(3)}", rng.nextInt(60).toLong, i.toLong))
      val intervals = (0 until 15).map { i =>
        val s = rng.nextInt(60).toLong
        (s"k${rng.nextInt(3)}", s, s + rng.nextInt(20), i.toLong)
      }
      val got = RangeJoin.intervalJoin(
          points.toDF("k", "p", "pid"),
          intervals.toDF("k", "s", "e", "iid"),
          Seq("k"), "p", "s", "e", width)
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted
      val expected = (for {
        (pk, p, pid) <- points
        (ik, s, e, iid) <- intervals
        if pk == ik && p >= s && p <= e
      } yield (pid, iid)).sorted
      got.toSeq shouldBe expected
    }
  }
}
