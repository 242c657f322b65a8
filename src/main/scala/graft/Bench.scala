package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // min over `reps` runs per query: single-run local[32] timings swing
    // ±20% with GC/JIT noise; the minimum is the stable "cost of the
    // plan" estimate. Reported in the JSON so rounds stay comparable.
    val reps = sys.env.getOrElse("GRAFT_BENCH_REPS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb one-time JVM/codegen/IO warm-up outside the timed region
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }
    // optional args filter to isolated queries (dev loop; driver passes none)
    val only = args.toSet
    val results = (SparkEntry.queries ++ Queries.benchOnly).toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .map { case (name, fn) =>
        val times = (1 to reps).map { _ =>
          // isolate each timed run: operators that persist() intermediates
          // (dedup/ANN families) would otherwise leave cached blocks that
          // tax every query running after them in the alphabetical order —
          // the r7 bench showed code-unchanged small queries slowing 2-8x
          // from exactly this. Clear the cache and nudge GC OUTSIDE the
          // timed region so each number is attributable to its own plan.
          spark.catalog.clearCache()
          System.gc()
          // the GC above queues broadcast/shuffle cleanup on the async
          // ContextCleaner; give it a moment to drain OFF the timed
          // region, or the heavy dedup/ANN families' cleanup lands
          // inside whichever small query runs next (mdkv_doc_level
          // measured 0.7 s isolated vs ~3 s mid-suite from exactly this)
          Thread.sleep(200)
          val t0 = System.nanoTime()
          // noop sink, not count(): count() lets Catalyst prune every
          // unreferenced projection, so projection-heavy queries would time
          // a bare scan instead of the operator. The noop sink consumes
          // every row and column with zero write cost.
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
          (System.nanoTime() - t0) / 1e9
        }
        name -> times.min
      }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"agg":"min"}""")
    spark.stop()
  }
}
