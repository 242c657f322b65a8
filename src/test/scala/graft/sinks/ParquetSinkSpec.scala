package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ParquetSinkSpec extends SparkSpec {
  import spark.implicits._

  test("estimate: bytes/row from a sample written on the OUTPUT filesystem") {
    val df = (1 to 2000).map(i => (i.toLong, "x" * 100)).toDF("id", "pad")
    val out = Files.createTempDirectory("sink-est-").toString + "/t"
    val est = ParquetSink.estimateMaxRecordsPerFile(df, out, targetMb = 128)
    // ~100 bytes/row raw; snappy+dictionary compresses the constant pad
    // heavily, so just assert a sane positive range
    est should be > 100000L
    // the sizing temp dir is cleaned up
    val parent = new org.apache.hadoop.fs.Path(out).getParent
    val fs = parent.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(parent).map(_.getPath.getName)
      .exists(_.startsWith(".graft_sizing_")) shouldBe false
  }

  test("empty frame: estimate 0 = unlimited, write still succeeds") {
    val df = Seq.empty[(Long, String)].toDF("id", "pad")
    val out = Files.createTempDirectory("sink-empty-").toString + "/t"
    ParquetSink.estimateMaxRecordsPerFile(df, out, 150) shouldBe 0L
    ParquetSink.write(df, out).maxRecordsPerFile shouldBe 0L
  }

  test("maxRecordsPerFile bounds file sizes") {
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(1)
    val out = Files.createTempDirectory("sink-max-").toString + "/t"
    ParquetSink.write(df, out, maxRecordsPerFile = Some(10L))
    val files = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    files should be >= 10
  }

  test("coalescePartitions: one file per Hive partition instead of one per task") {
    val df = (1 to 400).map(i => (i.toLong, s"g${i % 4}")).toDF("id", "grp")
      .repartition(8) // many tasks, each seeing every group
    val outA = Files.createTempDirectory("sink-coal-").toString + "/a"
    ParquetSink.write(df, outA, Seq("grp"))
    val outB = Files.createTempDirectory("sink-coal-").toString + "/b"
    ParquetSink.write(df, outB, Seq("grp"), coalescePartitions = true)
    def filesPerPartition(root: String): Int =
      new java.io.File(s"$root/grp=g0").listFiles()
        .count(_.getName.endsWith(".parquet"))
    filesPerPartition(outA) should be > 1  // sliver files from every task
    filesPerPartition(outB) shouldBe 1     // repartitioned: single writer
  }
}
