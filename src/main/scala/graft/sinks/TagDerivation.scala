package graft.sinks

import graft.core.DataContract

/** Tag derivation → table properties (SURVEY.md §2.4 W6; reference
  * src/dativo_ingest/tag_derivation.py:24-310 — the reference's
  * most-tested module, 1084-LoC suite).
  *
  * NO automatic classification: only explicitly defined tags propagate.
  * Three-level precedence, later overrides earlier:
  *   1. source system tags (lowest)
  *   2. asset definition (schema classification / compliance / finops)
  *   3. job config overrides (highest)
  */
object TagDerivation {

  /** tag_derivation.py:72-104 — per-field classification, lowercased. */
  def fieldClassifications(
      contract: DataContract,
      classificationOverrides: Map[String, String] = Map.empty,
      sourceTags: Map[String, String] = Map.empty
  ): Map[String, String] =
    contract.fields.flatMap { f =>
      val v = classificationOverrides.get(f.name)
        .orElse(f.classification)
        .orElse(sourceTags.get(f.name))
      v.map(c => f.name -> c.toLowerCase)
    }.toMap

  /** tag_derivation.py:106-128 — default table classification: override
    * beats the first compliance classification; never auto-derived.
    */
  def defaultClassification(
      contract: DataContract,
      classificationOverrides: Map[String, String] = Map.empty
  ): Option[String] =
    classificationOverrides.get("default")
      .orElse(contract.complianceClassification.headOption)
      .orElse(contract.defaultClassification)
      .map(_.toLowerCase)

  /** tag_derivation.py:130-181 — retention/owner/domain/data_product/
    * regulations; override beats asset; empty owner suppressed; 0 is a
    * valid retention.
    */
  def governanceTags(
      contract: DataContract,
      governanceOverrides: Map[String, Any] = Map.empty
  ): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    val retention = governanceOverrides.get("retention_days")
      .map(String.valueOf)
      .orElse(contract.retentionDays.map(_.toString))
    retention.foreach(r => b += "retention_days" -> r)
    val owner = (if (governanceOverrides.contains("owner"))
      Option(governanceOverrides("owner")).map(String.valueOf)
    else contract.owner).filter(_.nonEmpty)
    owner.foreach(o => b += "owner" -> o)
    contract.domain.foreach(d => b += "domain" -> d)
    contract.dataProduct.foreach(d => b += "data_product" -> d)
    if (contract.regulations.nonEmpty)
      b += "regulations" -> contract.regulations.mkString(",")
    b.result()
  }

  /** tag_derivation.py:183-245 — asset finops as base, overrides win;
    * business_tags list joined with commas.
    */
  def finopsTags(
      contract: DataContract,
      finopsOverrides: Map[String, Any] = Map.empty
  ): Map[String, String] = {
    val merged = contract.finops ++ finopsOverrides
    def get(k: String): Option[String] = merged.get(k).flatMap(Option(_)).flatMap {
      case s: Seq[_]            => Some(s.map(String.valueOf).mkString(","))
      case l: java.util.List[_] =>
        import scala.jdk.CollectionConverters._
        Some(l.asScala.map(String.valueOf).mkString(","))
      case v =>
        val s = String.valueOf(v)
        if (s.isEmpty) None else Some(s)
    }
    Seq("cost_center", "business_tags", "project", "environment")
      .flatMap(k => get(k).map(k -> _)).toMap
  }

  /** tag_derivation.py:249-280 — all tags, namespaced, plus the asset.*
    * identification block the committer adds (iceberg_committer.py:221-305).
    */
  def deriveAll(
      contract: DataContract,
      classificationOverrides: Map[String, String] = Map.empty,
      finopsOverrides: Map[String, Any] = Map.empty,
      governanceOverrides: Map[String, Any] = Map.empty,
      sourceTags: Map[String, String] = Map.empty
  ): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    defaultClassification(contract, classificationOverrides)
      .foreach(c => b += "classification.default" -> c)
    fieldClassifications(contract, classificationOverrides, sourceTags)
      .foreach { case (f, c) => b += s"classification.fields.$f" -> c }
    governanceTags(contract, governanceOverrides)
      .foreach { case (k, v) => b += s"governance.$k" -> v }
    finopsTags(contract, finopsOverrides)
      .foreach { case (k, v) => b += s"finops.$k" -> v }
    b.result()
  }

  /** asset.* identification properties (iceberg_committer.py:252-268). */
  def assetProperties(contract: DataContract): Map[String, String] =
    Map("asset.name" -> contract.name, "asset.version" -> contract.version) ++
      contract.domain.map("asset.domain" -> _) ++
      contract.dataProduct.map("asset.data_product" -> _) ++
      contract.sourceType.map("asset.source_type" -> _) ++
      contract.objectName.map("asset.object" -> _)

  /** Idempotent diff against existing table properties: only entries that
    * are new or changed (iceberg_committer.py:221-305's merge-then-set).
    */
  def diffProperties(existing: Map[String, String],
      desired: Map[String, String]): Map[String, String] =
    desired.filter { case (k, v) => !existing.get(k).contains(v) }
}
