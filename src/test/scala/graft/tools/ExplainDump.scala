package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan dumper: write `.explain("formatted")` of named
  * registered queries to `<outDir>/<name>_<suffix>.txt` — the
  * before/after plan evidence the optimization rounds commit under
  * `plans/`. Test scope — not part of the shipped library.
  *
  * Usage:
  *   sbt "Test/runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> <q1,q2,...>"
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names) = args
    val wanted = names.split(",").filter(_.nonEmpty).toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val all = graft.SparkEntry.queries ++ graft.Queries.benchOnly
    wanted.foreach { n =>
      graft.core.CacheScope.scoped {
        val plan = all(n)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), plan)
        println(s"[explain-dump] $n -> $outDir/${n}_$suffix.txt")
      }
    }
    spark.stop()
  }
}
