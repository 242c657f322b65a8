package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DevExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), col("text"))
    graft.operators.TextAnalysis.repetitionNgramSignals(df, "doc_id", "text")
      .explain("formatted")
    spark.stop()
  }
}
