package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-bench for the repetition gram kernels. */
object DevShingleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    df.cache(); df.count()
    val allNs = Seq(2, 3, 4, 5, 6, 7, 8, 9, 10)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    def oldSignals(): Long = {
      val topNs = Seq(2, 3, 4)
      val dupNs = Seq(5, 6, 7, 8, 9, 10)
      val tall = df
        .select(col("doc_id").as("id"),
          length(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
            .cast("long").as("total"),
          posexplode(array(allNs.map(n =>
            graft.functions.TextShinglesAll(col("text"), n)): _*))
            .as(Seq("ni", "grams")))
        .select(col("id"), col("total"),
          (col("ni") + lit(2)).as("n"), explode(col("grams")).as("g"))
        .select(col("id"), col("total"), col("n"),
          xxhash64(col("g")).as("h"),
          length(col("g")).cast("long").as("len"))
      val counts = tall.groupBy("id", "total", "n", "h")
        .agg(count(lit(1)).as("c"), max(col("len")).as("len"))
        .withColumn("cov", col("c") * col("len"))
      val perN = counts.groupBy("id", "total", "n").agg(
        max(struct(col("c"), col("len"))).as("m"),
        sum(when(col("c") >= 2, col("cov")).otherwise(0L)).as("dup_cov"))
        .withColumn("top_cov", col("m.c") * col("m.len")).drop("m")
      def frac(cov: org.apache.spark.sql.Column) =
        cov.cast("double") / when(col("total") > 0, col("total").cast("double"))
      val aggCols =
        topNs.map(n => max(when(col("n") === n, frac(col("top_cov"))))
          .as(s"top${n}gram_char_frac")) ++
          dupNs.map(n => max(when(col("n") === n, frac(col("dup_cov"))))
            .as(s"dup${n}gram_char_frac"))
      perN.groupBy(col("id"), col("total")).agg(aggCols.head, aggCols.tail: _*)
        .count()
    }
    for (_ <- 1 to 3) {
      time("NEW repetitionNgramSignals") {
        graft.operators.TextAnalysis.repetitionNgramSignals(df, "doc_id", "text").count()
      }
      time("OLD (r15) formulation") { oldSignals() }
      time("fused hashedShingles") {
        df.select(explode(graft.functions.TextShinglesHashed(col("text"), allNs)).as("s"))
          .selectExpr("s.n", "s.h", "s.len").count()
      }
      time("unfused 9x all+hash") {
        df.select(posexplode(array(allNs.map(n =>
            graft.functions.TextShinglesAll(col("text"), n)): _*)).as(Seq("ni", "grams")))
          .select(explode(col("grams")).as("g"))
          .select(xxhash64(col("g")), length(col("g"))).count()
      }
    }
    spark.stop()
  }
}
