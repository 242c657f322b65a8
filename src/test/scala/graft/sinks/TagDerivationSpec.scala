package graft.sinks

import graft.core.{ContractField, DataContract}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** W6 precedence semantics vs tag_derivation.py:24-310 (the reference's
  * most-tested module) — golden cases + an exhaustive property check of
  * the 3-level hierarchy.
  */
class TagDerivationSpec extends AnyFunSuite with Matchers {

  private val contract = DataContract(
    name = "cust", version = "2.0",
    domain = Some("sales"), dataProduct = Some("crm"),
    owner = Some("team@corp"),
    retentionDays = Some(365),
    complianceClassification = Seq("CONFIDENTIAL", "internal"),
    regulations = Seq("GDPR", "CCPA"),
    finops = Map("cost_center" -> "FIN-1", "business_tags" -> Seq("pay", "rev")),
    sourceType = Some("csv"), objectName = Some("customers"),
    fields = Seq(
      ContractField("email", "string", classification = Some("SENSITIVE_PII")),
      ContractField("name", "string"),
      ContractField("amount", "double")))

  test("field classification precedence: override > asset > source") {
    val out = TagDerivation.fieldClassifications(
      contract,
      classificationOverrides = Map("email" -> "HIGH_PII"),
      sourceTags = Map("email" -> "PII", "name" -> "PII", "amount" -> "FINANCIAL"))
    out("email") shouldBe "high_pii"  // override wins, lowercased
    out("name") shouldBe "pii"        // only source tag
    out("amount") shouldBe "financial"
  }

  test("no automatic classification: untagged fields absent") {
    TagDerivation.fieldClassifications(contract) shouldBe Map("email" -> "sensitive_pii")
  }

  test("default classification: override > first compliance entry") {
    TagDerivation.defaultClassification(contract) shouldBe Some("confidential")
    TagDerivation.defaultClassification(contract,
      Map("default" -> "PUBLIC")) shouldBe Some("public")
  }

  test("governance: overrides beat asset; empty owner suppressed; 0 valid") {
    val base = TagDerivation.governanceTags(contract)
    base("retention_days") shouldBe "365"
    base("owner") shouldBe "team@corp"
    base("regulations") shouldBe "GDPR,CCPA"
    val over = TagDerivation.governanceTags(contract,
      Map("retention_days" -> 0, "owner" -> ""))
    over("retention_days") shouldBe "0"
    over.get("owner") shouldBe None // explicit empty removes it
  }

  test("finops: asset base merged under overrides; lists joined") {
    val out = TagDerivation.finopsTags(contract, Map("project" -> "apollo"))
    out("cost_center") shouldBe "FIN-1"
    out("business_tags") shouldBe "pay,rev"
    out("project") shouldBe "apollo"
  }

  test("deriveAll namespaces + asset properties") {
    val all = TagDerivation.deriveAll(contract) ++
      TagDerivation.assetProperties(contract)
    all("classification.default") shouldBe "confidential"
    all("classification.fields.email") shouldBe "sensitive_pii"
    all("governance.domain") shouldBe "sales"
    all("finops.cost_center") shouldBe "FIN-1"
    all("asset.name") shouldBe "cust"
    all("asset.object") shouldBe "customers"
  }

  test("diffProperties is an idempotent merge") {
    val desired = Map("a" -> "1", "b" -> "2")
    TagDerivation.diffProperties(Map("a" -> "1"), desired) shouldBe Map("b" -> "2")
    TagDerivation.diffProperties(desired, desired) shouldBe Map.empty
  }

  test("property: 3-level hierarchy always resolves to the highest defined") {
    val values: Seq[Option[String]] =
      None +: Seq("PII", "secret", "Public", "internal").map(Some(_))
    for (src <- values; asset <- values; over <- values) {
      val c = DataContract(name = "t", fields = Seq(
        ContractField("f", "string", classification = asset)))
      val out = TagDerivation.fieldClassifications(
        c,
        classificationOverrides = over.map("f" -> _).toMap,
        sourceTags = src.map("f" -> _).toMap)
      withClue(s"src=$src asset=$asset over=$over: ") {
        out.get("f") shouldBe over.orElse(asset).orElse(src).map(_.toLowerCase)
      }
    }
  }
}
