package graft.sources

import graft.core.DataContract
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Airbyte engine source S6–S8 (SURVEY.md §2.1; reference
  * connectors/engine_framework.py:76-304): run a connector image, feed it
  * config on stdin, parse the JSONL Airbyte protocol from stdout —
  * RECORD rows for the selected streams, STATE checkpoints, LOGs ignored.
  *
  * The subprocess runs on the driver exactly like the reference's
  * `docker run --rm -i <image> read --config /dev/stdin`
  * (engine_framework.py:216-234); the command is injectable so the
  * protocol path is testable without docker (any process emitting the
  * JSONL works). Records land in a DataFrame via `from_json` against the
  * contract's raw schema. For a stream that outgrows driver memory the
  * documented scale path is a DataSource V2 PartitionReader wrapping the
  * same subprocess per partition.
  */
object AirbyteSource {

  final case class Message(msgType: String, stream: Option[String],
      dataJson: Option[String], stateJson: Option[String])

  /** Shared mapper — ObjectMapper is thread-safe for reads, and a fresh
    * instance per protocol line would dominate a multi-million-record
    * extract.
    */
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Parse one protocol line (engine_framework.py:241-261). Malformed
    * lines are ignored like the reference's continue-on-JSONDecodeError.
    */
  def parseMessage(line: String): Option[Message] = {
    if (line.trim.isEmpty) return None
    try {
      val node = mapper.readTree(line)
      Option(node.get("type")).map(_.asText()) match {
        case Some("RECORD") =>
          val rec = node.get("record")
          Some(Message("RECORD",
            Option(rec.get("stream")).map(_.asText()),
            Option(rec.get("data")).map(_.toString), None))
        case Some("STATE") =>
          Some(Message("STATE", None, None,
            Option(node.get("state")).map(_.toString)))
        case Some(other) => Some(Message(other, None, None, None))
        case None        => None
      }
    } catch { case _: Exception => None }
  }

  final case class ExtractResult(df: DataFrame, lastState: Option[String],
      recordCount: Long)

  /** Drain a protocol stream: RECORDs of the selected streams → rows,
    * last STATE retained (engine_framework.py:286-304).
    */
  def fromMessages(spark: SparkSession, lines: Iterator[String],
      streams: Set[String], contract: DataContract): ExtractResult = {
    val records = Vector.newBuilder[String]
    var lastState: Option[String] = None
    var count = 0L
    lines.flatMap(parseMessage).foreach {
      case Message("RECORD", Some(s), Some(data), _)
          if streams.isEmpty || streams.contains(s) =>
        records += data
        count += 1
      case Message("STATE", _, _, st) => lastState = st.orElse(lastState)
      case _                          => ()
    }
    import spark.implicits._
    val jsonDs = spark.createDataset(records.result())
    val parsed = jsonDs
      .select(from_json(col("value"), contract.rawStructType).as("r"))
      .select(col("r.*"))
    ExtractResult(parsed, lastState, count)
  }

  /** Run the connector command (e.g. `docker run --rm -i <image> read
    * --config /dev/stdin`), write config to stdin, stream stdout.
    */
  def fromProcess(spark: SparkSession, command: Seq[String], configJson: String,
      streams: Set[String], contract: DataContract): ExtractResult = {
    val pb = new ProcessBuilder(command.asJava)
    val proc = pb.start()
    // Drain stderr on a daemon thread — a chatty connector fills the
    // ~64KB OS pipe buffer otherwise and deadlocks the extract. The last
    // lines are kept for the failure message.
    val errTail = new java.util.concurrent.ConcurrentLinkedDeque[String]()
    val drainer = new Thread(() => {
      val er = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getErrorStream, "UTF-8"))
      try Iterator.continually(er.readLine()).takeWhile(_ != null).foreach { l =>
        errTail.addLast(l)
        while (errTail.size() > 50) errTail.pollFirst()
      } finally er.close()
    })
    drainer.setDaemon(true)
    drainer.start()
    // a connector that never reads stdin (or exits early) breaks the
    // pipe — that's its prerogative, not an extract failure
    try {
      val stdin = proc.getOutputStream
      stdin.write(configJson.getBytes("UTF-8"))
      stdin.close()
    } catch { case _: java.io.IOException => () }
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
    try {
      val lines = Iterator.continually(reader.readLine()).takeWhile(_ != null)
      val result = fromMessages(spark, lines, streams, contract)
      val exit = proc.waitFor()
      if (exit != 0)
        throw new RuntimeException(
          s"airbyte connector exited with code $exit; stderr tail: " +
            errTail.asScala.mkString(" | "))
      result
    } finally reader.close()
  }

  /** The docker command line the reference builds
    * (engine_framework.py:216-226).
    */
  def dockerCommand(image: String): Seq[String] =
    Seq("docker", "run", "--rm", "-i", image, "read", "--config", "/dev/stdin")
}
