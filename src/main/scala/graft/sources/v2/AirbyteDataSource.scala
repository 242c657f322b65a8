package graft.sources.v2

import graft.sources.AirbyteSource
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 Airbyte connector — the scale path for S6 (SURVEY.md
  * §2.1): instead of draining the whole protocol stream on the driver
  * (`AirbyteSource.fromProcess`), each selected stream becomes one
  * InputPartition whose EXECUTOR runs its own connector subprocess and
  * emits rows as they arrive. Reading N streams fans out to N concurrent
  * connector processes with no driver materialization.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.v2.AirbyteDataSource")
  *     .schema(contract.rawStructType)        // all-string landing schema
  *     .option("command", "docker,run,--rm,-i,<image>,read,--config,/dev/stdin")
  *     .option("config", configJson)
  *     .option("streams", "customers,invoices")
  *     .load()
  * }}}
  *
  * The schema is caller-declared (contracts are explicit in this engine,
  * §1.2 — no inference pass against a rate-limited SaaS API); values land
  * as strings and T1 coercion types them downstream, exactly like the CSV
  * path.
  */
class AirbyteDataSource extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "graft airbyte source requires an explicit .schema(...) — contracts are declared, not inferred")

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new AirbyteTable(schema)
}

private[v2] class AirbyteTable(schema: StructType) extends Table with SupportsRead {
  override def name(): String = "airbyte"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val command = Option(options.get("command")).getOrElse(
      throw new IllegalArgumentException("airbyte source requires option 'command'"))
      .split(",").toSeq
    val config = Option(options.get("config")).getOrElse("{}")
    val streams = Option(options.get("streams")).map(_.split(",").toSeq)
      .getOrElse(Seq(""))
    new ScanBuilder {
      override def build(): Scan = new AirbyteScan(schema, command, config, streams)
    }
  }
}

private[v2] class AirbyteScan(schema: StructType, command: Seq[String],
    config: String, streams: Seq[String]) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    streams.map(s => AirbyteStreamPartition(s): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new AirbyteReaderFactory(schema, command, config)
}

private[v2] final case class AirbyteStreamPartition(stream: String)
    extends InputPartition

private[v2] class AirbyteReaderFactory(schema: StructType, command: Seq[String],
    config: String) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val stream = partition.asInstanceOf[AirbyteStreamPartition].stream
    new PartitionReader[InternalRow] {
      private val proc = {
        val pb = new ProcessBuilder(command.asJava)
        // discard stderr — an undrained pipe deadlocks chatty connectors
        pb.redirectError(ProcessBuilder.Redirect.DISCARD)
        val p = pb.start()
        try { // stdin-ignoring commands break the pipe; tolerated
          val in = p.getOutputStream
          in.write(config.getBytes("UTF-8"))
          in.close()
        } catch { case _: java.io.IOException => () }
        p
      }
      private val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
      private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      private var row: InternalRow = _

      override def next(): Boolean = {
        var line = reader.readLine()
        while (line != null) {
          AirbyteSource.parseMessage(line) match {
            case Some(m) if m.msgType == "RECORD" &&
                (stream.isEmpty || m.stream.contains(stream)) =>
              row = toRow(m.dataJson.getOrElse("{}"))
              return true
            case _ => () // STATE/LOG or other streams: skip
          }
          line = reader.readLine()
        }
        val exit = proc.waitFor()
        if (exit != 0)
          throw new RuntimeException(s"airbyte connector exited with code $exit")
        false
      }

      private def toRow(dataJson: String): InternalRow = {
        val node = mapper.readTree(dataJson)
        val values: Array[Any] = schema.fields.map { f =>
          val v = node.get(f.name)
          if (v == null || v.isNull) null
          else UTF8String.fromString(if (v.isTextual) v.asText() else v.toString)
        }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
      }

      override def get(): InternalRow = row
      override def close(): Unit = {
        reader.close()
        proc.destroy()
      }
    }
  }
}
