package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** JSONL export sink — the write half of the JSONL round-trip
  * (beyond-reference; the read half is
  * [[graft.sources.JsonlSource]]). Training-data tooling downstream of
  * this engine (tokenizer trainers, eval harnesses, annotation UIs)
  * overwhelmingly consumes one-JSON-object-per-line text, so a curated
  * corpus needs a first-class export path, not just parquet.
  *
  * Shape: `to_json(struct(*))` over the row — a pure codegen projection
  * — written through the text writer. Shuffle-free; `partitionCols`
  * reuse [[ParquetSink.preparePartitions]] (Hive-style layout, value
  * normalization, ingest_date synthesis) so JSONL exports land in the
  * same directory scheme as the parquet tables. Optional codec
  * (gzip/zstd) — note compressed JSONL is WHOLE-FILE, not
  * line-splittable: gzip/zstd text streams have no sync points, so a
  * downstream Spark/Hadoop reader processes each compressed file as a
  * single task. That is fine when the written files are already
  * shard-sized (this sink inherits upstream partitioning — write
  * enough output partitions that each file is a sane task), but for a
  * corpus that must re-split inside single huge files, write
  * uncompressed JSONL (or parquet) instead.
  */
object JsonlSink {

  def write(df: DataFrame, outPath: String,
      partitionCols: Seq[String] = Seq.empty,
      codec: Option[String] = None,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val prepared = ParquetSink.preparePartitions(df, partitionCols)
    val partLower = partitionCols.map(_.toLowerCase)
    val payloadCols = prepared.columns.filterNot(partLower.contains)
    // partition columns ride in the path, not the payload (parquet
    // partitionBy parity); to_json drops null fields — JSON absence IS
    // null on the read side, keeping the round-trip lossless
    val line = prepared.withColumn("value",
      to_json(struct(payloadCols.map(col): _*)))
      .select(("value" +: partLower).map(col): _*)
    var w = line.write.mode(mode)
    codec.foreach(c => w = w.option("compression", c))
    if (partLower.nonEmpty) w = w.partitionBy(partLower: _*)
    w.text(outPath)
  }
}
