package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: split `search_bm25_store_topk`'s cost into build vs probe
  * at a given corpus dir — `Test/runMain graft.tools.ProfileBm25 <dir>`.
  */
object ProfileBm25 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    docs.count() // warm
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { rep =>
      spark.catalog.clearCache()
      val store = java.nio.file.Files
        .createTempDirectory("profile_bm25_").toString
      timed(s"build rep$rep") {
        graft.operators.Search.writePostingsStore(
          docs, "doc_id", "text", store, buckets = 8)
      }
      val q = docs.filter(col("doc_id") % 100 === 7)
      timed(s"probe rep$rep") {
        graft.operators.Search.bm25TopKFromStore(
          spark, store, q, "doc_id", "text", k = 10)
          .write.format("noop").mode("overwrite").save()
      }
      val nTerms = timed(s"queryterms rep$rep") {
        q.select(explode(split(lower(trim(col("text"))), "\\s+")))
          .distinct().count()
      }
      System.err.println(s"[profile] distinct query terms: $nTerms")
    }
    spark.stop()
  }
}
