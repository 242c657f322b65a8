package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden query-builder strings vs the reference's SQL
  * (postgres_extractor.py:156-204, mysql_extractor.py:166-217) + the S3
  * BLOB rule (mysql_extractor.py:337-347).
  */
class JdbcSourceSpec extends SparkSpec {
  import SqlDialect._

  test("postgres: plain scan quotes with double quotes") {
    JdbcSource.buildQuery(Some("public"), "users", Postgres, None) shouldBe
      """SELECT * FROM "public"."users""""
  }

  test("postgres: cursor predicate pushed into WHERE, value escaped") {
    val q = JdbcSource.buildQuery(Some("s"), "t", Postgres,
      Some(IncrementalSpec("updated_at", lastValue = Some("2024-01-01T00:00:00"))))
    q shouldBe
      """SELECT * FROM "s"."t" WHERE "updated_at" >= '2024-01-01T00:00:00'"""
    JdbcSource.buildQuery(None, "t", Postgres,
      Some(IncrementalSpec("c", lastValue = Some("o'brien")))) should
      include("'o''brien'")
  }

  test("postgres: lookback window when no cursor value (I5)") {
    JdbcSource.buildQuery(None, "t", Postgres,
      Some(IncrementalSpec("created", lookbackDays = Some(7)))) shouldBe
      """SELECT * FROM "t" WHERE "created" >= CURRENT_DATE - INTERVAL '7 days'"""
  }

  test("mysql: backtick quoting + DATE_SUB lookback") {
    JdbcSource.buildQuery(Some("db"), "orders", MySql,
      Some(IncrementalSpec("updated_at", lookbackDays = Some(3)))) shouldBe
      "SELECT * FROM `db`.`orders` WHERE `updated_at` >= DATE_SUB(CURDATE(), INTERVAL 3 DAY)"
  }

  test("ORDER BY cursor only on request (we prefer the true max aggregate)") {
    JdbcSource.buildQuery(None, "t", Postgres,
      Some(IncrementalSpec("c", lastValue = Some("1"))),
      orderByCursor = true) should endWith("""ORDER BY "c"""")
  }

  test("read options: subquery dbtable, fetchsize, partitioned fan-out") {
    val opts = JdbcSource.readOptions("jdbc:postgresql://h/db", "SELECT 1",
      fetchSize = 10000,
      partitioning = Some(JdbcPartitioning("id", "0", "1000", 8)))
    opts("dbtable") shouldBe "(SELECT 1) graft_src"
    opts("fetchsize") shouldBe "10000"
    opts("numPartitions") shouldBe "8"
  }

  test("BLOB rule: valid utf-8 decodes, invalid bytes base64 (S3)") {
    import spark.implicits._
    val valid = "héllo".getBytes("UTF-8")
    val invalid = Array[Byte](0xC3.toByte, 0x28) // malformed 2-byte seq
    val df = Seq((1, valid), (2, invalid)).toDF("id", "payload")
    val out = JdbcSource.stringifyBlobs(df).orderBy("id").collect()
    out(0).getString(1) shouldBe "héllo"
    out(1).getString(1) shouldBe
      java.util.Base64.getEncoder.encodeToString(invalid)
    JdbcSource.stringifyBlobs(df).schema("payload").dataType.typeName shouldBe "string"
  }
}
