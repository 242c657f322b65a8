package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL dialect for identifier quoting + lookback syntax.
  * Postgres quotes "s"."t" (postgres_extractor.py:156-204);
  * MySQL backticks `s`.`t` and DATE_SUB(CURDATE(), INTERVAL n DAY)
  * (mysql_extractor.py:166-217).
  */
sealed trait SqlDialect {
  def quote(ident: String): String
  def lookbackExpr(days: Int): String
  def name: String
}
object SqlDialect {
  case object Postgres extends SqlDialect {
    def quote(ident: String): String = "\"" + ident.replace("\"", "\"\"") + "\""
    def lookbackExpr(days: Int): String = s"CURRENT_DATE - INTERVAL '$days days'"
    def name = "postgres"
  }
  case object MySql extends SqlDialect {
    def quote(ident: String): String = "`" + ident.replace("`", "``") + "`"
    def lookbackExpr(days: Int): String = s"DATE_SUB(CURDATE(), INTERVAL $days DAY)"
    def name = "mysql"
  }
}

/** Incremental predicate source: either a persisted cursor value or a
  * lookback window (SURVEY.md §2.5 I4/I5;
  * postgres_extractor.py:182-204, mysql_extractor.py:194-217).
  */
final case class IncrementalSpec(
    cursorField: String,
    lastValue: Option[String] = None,
    lookbackDays: Option[Int] = None
)

/** Partitioned-read spec — the scale improvement over the reference's
  * single-stream fetch (its in-job parallelism is explicitly "pending",
  * IMPLEMENTATION_SUMMARY.md:144-148). On a real cluster this fans the scan
  * out to `numPartitions` concurrent executor-side JDBC readers.
  */
final case class JdbcPartitioning(
    partitionColumn: String,
    lowerBound: String,
    upperBound: String,
    numPartitions: Int
)

/** JDBC sources S2/S3 (SURVEY.md §2.1).
  *
  * The reference issues
  *   SELECT * FROM "s"."t" [WHERE cursor >= %s | >= lookback] [ORDER BY cursor]
  * over a server-side cursor (postgres_extractor.py:156-204,286-315;
  * mysql_extractor.py:166-217,316-356). We push the same predicate into the
  * JDBC subquery (so the database applies it — identical pushdown) and drop
  * the ORDER BY: the reference only needed it so "last row = max cursor"
  * held; Spark computes the true max with an aggregate instead (I4), so the
  * database doesn't pay for a sort.
  */
object JdbcSource {

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** MySQL BLOB rule (S3; mysql_extractor.py:337-347): a BLOB column is
    * utf-8-decoded when its bytes are valid utf-8, else base64-encoded —
    * Python's `bytes.decode("utf-8")` try/except split. A binary→string
    * cast wraps the raw bytes unvalidated, so `is_valid_utf8` is the
    * exact probe (Spark 4's `decode` would throw on malformed input).
    */
  def blobToString(c: Column): Column = {
    val s = c.cast(org.apache.spark.sql.types.StringType)
    when(is_valid_utf8(s), s).otherwise(base64(c))
  }

  /** Apply the BLOB rule to every binary column of a scanned frame. */
  def stringifyBlobs(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == org.apache.spark.sql.types.BinaryType)
        blobToString(col(f.name)).as(f.name)
      else col(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  /** Build the pushdown subquery. Matches the reference's WHERE semantics;
    * golden-tested in JdbcSourceSpec against the reference's query strings.
    */
  def buildQuery(
      schema: Option[String],
      table: String,
      dialect: SqlDialect,
      incremental: Option[IncrementalSpec],
      orderByCursor: Boolean = false
  ): String = {
    val rel = (schema.toSeq :+ table).map(dialect.quote).mkString(".")
    val where = incremental.flatMap { inc =>
      val c = dialect.quote(inc.cursorField)
      inc.lastValue
        .map(v => s"$c >= '${v.replace("'", "''")}'")
        .orElse(inc.lookbackDays.map(d => s"$c >= ${dialect.lookbackExpr(d)}"))
    }
    val order =
      if (orderByCursor && incremental.nonEmpty)
        s" ORDER BY ${dialect.quote(incremental.get.cursorField)}"
      else ""
    s"SELECT * FROM $rel" + where.map(w => s" WHERE $w").getOrElse("") + order
  }

  /** Assemble the full option map for spark.read.format("jdbc").
    * fetchsize mirrors the reference's batch_size=10000 server-side cursor
    * (postgres_extractor.py:43-46).
    */
  def readOptions(
      url: String,
      query: String,
      fetchSize: Int = 10000,
      partitioning: Option[JdbcPartitioning] = None
  ): Map[String, String] = {
    val base = Map(
      "url" -> url,
      "dbtable" -> s"($query) graft_src",
      "fetchsize" -> fetchSize.toString
    )
    base ++ partitioning.map { p =>
      Map(
        "partitionColumn" -> p.partitionColumn,
        "lowerBound" -> p.lowerBound,
        "upperBound" -> p.upperBound,
        "numPartitions" -> p.numPartitions.toString
      )
    }.getOrElse(Map.empty)
  }

  def read(
      spark: SparkSession,
      url: String,
      schema: Option[String],
      table: String,
      dialect: SqlDialect,
      incremental: Option[IncrementalSpec] = None,
      fetchSize: Int = 10000,
      partitioning: Option[JdbcPartitioning] = None
  ): DataFrame = {
    val q = buildQuery(schema, table, dialect, incremental)
    spark.read.format("jdbc").options(readOptions(url, q, fetchSize, partitioning)).load()
  }
}
