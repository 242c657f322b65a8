package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only targeted Verify: run a subset of SparkEntry.queries and dump
  * just their oracle SQL, so a new oracle can be iterated against
  * tools/check_correctness.py in seconds instead of re-running all ~120
  * queries. Test scope — not part of the shipped library.
  *
  * Usage: sbt "Test/runMain graft.tools.DevVerifySubset <sfDir> <outDir> <q1,q2,...>"
  */
object DevVerifySubset {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val wanted = names.split(",").toSet
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    wanted.foreach { n =>
      graft.core.CacheScope.scoped {
        graft.SparkEntry.queries(n)(spark, sfDir)
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$n")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val sel = (graft.SparkEntry.oracleSql ++ graft.Queries.localOracles)
      .view.filterKeys(wanted).toMap
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      sel.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/_failed.json"), "{}")
    println(s"[dev-verify] wrote ${wanted.size} queries, ${sel.size} oracles")
    spark.stop()
  }
}
