package graft.plugins

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plugin SDK (SURVEY.md §2.1 S11 / §2.4 W7; reference
  * src/dativo_ingest/plugins.py:87-362).
  *
  * The reference loads Python classes from `path.py:ClassName` (or Rust
  * cdylibs) and optionally Docker-sandboxes them; the JVM-native analog is
  * a fully-qualified class name resolved from the application classpath.
  * Sandboxing is out of scope for v1 (SURVEY §2.1) — plugins run in-JVM.
  */

/** plugins.py:17-50 — connection check result. */
final case class ConnectionTestResult(
    success: Boolean,
    message: String = "",
    details: Map[String, String] = Map.empty)

/** plugins.py:52-84 — discovery result: available objects + metadata. */
final case class DiscoveryResult(
    objects: Seq[String],
    metadata: Map[String, String] = Map.empty)

/** Custom source (BaseReader, plugins.py:87-227). The Spark shape returns
  * one DataFrame rather than an iterator of dict batches — partitioning
  * replaces manual batching.
  */
trait Reader extends Serializable {
  def read(spark: SparkSession, config: Map[String, Any]): DataFrame
  def checkConnection(config: Map[String, Any]): ConnectionTestResult =
    ConnectionTestResult(success = true)
  def discover(config: Map[String, Any]): DiscoveryResult =
    DiscoveryResult(Seq.empty)
}

/** Metadata for one written file (plugins.py:230-290's file dicts). */
final case class FileMeta(path: String, records: Long, bytes: Long)

/** Custom sink (BaseWriter, plugins.py:230-362): write then (optionally)
  * commit — mirrors the reference's write_batch/commit_files split.
  */
trait Writer extends Serializable {
  def write(df: DataFrame, config: Map[String, Any]): Seq[FileMeta]
  def commit(metas: Seq[FileMeta], config: Map[String, Any]): Boolean = true
}

/** Reflective loader (plugins.py:365-723's dynamic import, minus the
  * sandbox): instantiates a no-arg class or resolves a Scala `object`.
  */
object PluginLoader {

  /** Cloud-mode sandbox policy (reference sandbox.py:1328-1360 +
    * plugins.py:543-545): the reference Docker-sandboxes plugins in cloud
    * mode by default, with `sandbox.enabled` as the explicit override in
    * either direction. This build has NO sandbox runtime — running an
    * untrusted class in-process would silently void the isolation the
    * cloud contract promises — so where the reference would sandbox, we
    * REFUSE to load, unless the config explicitly opts out with
    * `sandbox: {enabled: false}` (accepting in-process execution).
    * Self-hosted mode runs in-process, like the reference's default.
    */
  def requireSandboxPolicy(className: String, mode: String,
      pluginConfig: Map[String, Any] = Map.empty): Unit = {
    val explicit: Option[Boolean] = pluginConfig.get("enabled")
      .orElse(pluginConfig.get("sandbox") match {
        case Some(m: Map[String, Any] @unchecked) => m.get("enabled")
        case other => other
      })
      .map(v => String.valueOf(v).equalsIgnoreCase("true"))
    val needsSandbox = explicit.getOrElse(mode == "cloud")
    if (needsSandbox)
      throw new UnsupportedOperationException(
        s"Plugin '$className' requires sandboxed execution " +
          (if (mode == "cloud") "(cloud mode sandboxes plugins by default)"
           else "(sandbox.enabled=true)") +
          ", but this build has no sandbox runtime. Run in self_hosted " +
          "mode, or set sandbox.enabled=false to explicitly accept " +
          "in-process execution.")
  }

  def load[T](className: String, expected: Class[T]): T = {
    // A Scala `object` compiles to Name.class (static forwarders, no
    // constructor) + Name$.class (MODULE$ singleton) — probe the object
    // form first, then fall back to a no-arg class.
    val instance =
      try Class.forName(className.stripSuffix("$") + "$")
        .getField("MODULE$").get(null)
      catch {
        case _: ClassNotFoundException | _: NoSuchFieldException =>
          Class.forName(className).getDeclaredConstructor().newInstance()
      }
    if (!expected.isInstance(instance))
      throw new IllegalArgumentException(
        s"$className does not implement ${expected.getName}")
    instance.asInstanceOf[T]
  }

  def loadReader(className: String): Reader = load(className, classOf[Reader])
  def loadWriter(className: String): Writer = load(className, classOf[Writer])
}
