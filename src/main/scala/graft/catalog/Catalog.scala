package graft.catalog

/** Catalog metadata/lineage push W9 (SURVEY.md §2.4; reference
  * src/dativo_ingest/catalog/base.py:29-279, factory.py:35-57, pipeline
  * hook cli.py:1139-1205).
  *
  * Pure driver-side metadata clients. The reference ships four HTTP
  * backends (openmetadata / aws_glue / databricks_unity / nessie); the
  * engine-side contract is this trait — push entity, tags, lineage after
  * a successful commit, and NEVER fail the job on catalog errors. The
  * HTTP backends are deployment adapters (zero-egress here), so the
  * in-memory client is the concrete implementation and the factory
  * returns None for unimplemented types, which the job driver treats as
  * catalog-disabled (same degradation as the reference).
  */
final case class CatalogEntity(
    fullyQualifiedName: String,
    displayName: String,
    description: Option[String],
    properties: Map[String, String])

final case class LineageEdge(sourceFqn: String, targetFqn: String)

trait CatalogClient {
  def ensureEntity(entity: CatalogEntity): Unit
  def pushTags(fqn: String, tags: Map[String, String]): Unit
  def pushOwner(fqn: String, owner: String): Unit
  def pushLineage(edge: LineageEdge): Unit
}

/** Records every push — the test double AND a useful dry-run client. */
final class InMemoryCatalog extends CatalogClient {
  val entities = scala.collection.mutable.Map[String, CatalogEntity]()
  val tags = scala.collection.mutable.Map[String, Map[String, String]]()
  val owners = scala.collection.mutable.Map[String, String]()
  val lineage = scala.collection.mutable.ArrayBuffer[LineageEdge]()

  def ensureEntity(e: CatalogEntity): Unit = entities(e.fullyQualifiedName) = e
  def pushTags(fqn: String, t: Map[String, String]): Unit =
    tags(fqn) = tags.getOrElse(fqn, Map.empty) ++ t
  def pushOwner(fqn: String, owner: String): Unit = owners(fqn) = owner
  def pushLineage(edge: LineageEdge): Unit = lineage += edge
}

object CatalogFactory {

  /** factory.py:35-57 — type → client; unknown/unavailable types are
    * None (catalog push silently disabled, like the reference's
    * non-fatal handling). An openmetadata client needs an auth token
    * (connection config or env); without one it degrades to None.
    */
  def forType(
      catalogType: String,
      connection: Map[String, Any] = Map.empty,
      env: Map[String, String] = sys.env,
      transport: HttpTransport = new JavaHttpTransport()): Option[CatalogClient] =
    catalogType.toLowerCase match {
      case "memory" | "dry_run" => Some(new InMemoryCatalog)
      case "openmetadata" =>
        try Some(OpenMetadataCatalog.fromConnection(connection, env, transport))
        catch { case _: Exception => None } // no token ⇒ catalog-disabled
      case "databricks_unity" =>
        try Some(DatabricksUnityCatalog.fromConnection(connection, env, transport))
        catch { case _: Exception => None } // no workspace/token ⇒ disabled
      case "nessie" => Some(new NessieCatalog())
      case _ => None // aws_glue needs an SDK binding (GlueApi) injected
    }

  /** Entity extraction from a finished job (catalog/base.py:88-189):
    * fqn = domain.data_product.table.
    */
  def entityFor(contract: graft.core.DataContract,
      properties: Map[String, String]): CatalogEntity = {
    val fqn = Seq(
      contract.domain.getOrElse("default"),
      contract.dataProduct.getOrElse("default"),
      contract.name).mkString(".")
    CatalogEntity(fqn, contract.name, None, properties)
  }

  /** The non-fatal push wrapper (cli.py:1139-1205): any catalog failure
    * is swallowed; the job result is unaffected.
    */
  def pushAfterCommit(client: CatalogClient, contract: graft.core.DataContract,
      properties: Map[String, String], sourceFqns: Seq[String]): Boolean =
    try {
      val entity = entityFor(contract, properties)
      client.ensureEntity(entity)
      client.pushTags(entity.fullyQualifiedName, properties)
      contract.owner.foreach(client.pushOwner(entity.fullyQualifiedName, _))
      sourceFqns.foreach(s =>
        client.pushLineage(LineageEdge(s, entity.fullyQualifiedName)))
      true
    } catch { case _: Exception => false }
}
