package graft

/** Driver-contract smoke: entry() yields rows, and the query/oracle maps
  * stay consistent (an oracle key without a query silently drops a
  * correctness row).
  */
class SparkEntrySpec extends SparkSpec {

  test("entry flagship returns rows on sf0.001") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every oracle key has a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    missing shouldBe empty
  }

  test("every query runs and returns rows at sf0.001") {
    for ((name, fn) <- SparkEntry.queries) {
      withClue(s"$name: ") {
        fn(spark, "/root/testdata/sf0.001").count() should be >= 0L
      }
    }
  }
}
