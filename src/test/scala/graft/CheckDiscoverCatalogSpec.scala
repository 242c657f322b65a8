package graft

import graft.catalog._
import graft.config.Yaml
import graft.core.{ContractField, DataContract}
import java.nio.file.Files

class CheckDiscoverCatalogSpec extends SparkSpec {

  private def srcFor(yaml: String) = {
    val job = graft.config.JobConfig.fromMap(Yaml.loadString(
      s"tenant_id: t\nsource:\n$yaml"))
    job.resolveSource(graft.config.ConnectorRecipe.fromMap(Yaml.loadString(
      "type: csv\nroles: [source]\ndefault_engine: {type: native}\n")))
  }

  test("check: file source succeeds when paths exist, fails when missing") {
    val f = Files.createTempFile("chk-", ".csv")
    Files.writeString(f, "id\n1\n")
    CheckDiscover.checkSource(
      srcFor(s"  files:\n    - {path: $f}"), ".").success shouldBe true
    val r = CheckDiscover.checkSource(
      srcFor("  files:\n    - {path: /nope/missing.csv}"), ".")
    r.success shouldBe false
    r.message should include("missing")
  }

  test("check: jdbc without url fails cleanly") {
    val job = graft.config.JobConfig.fromMap(Yaml.loadString("tenant_id: t\n"))
    val src = job.resolveSource(graft.config.ConnectorRecipe.fromMap(Yaml.loadString(
      "type: postgres\nroles: [source]\ndefault_engine: {type: jdbc}\n")))
    CheckDiscover.checkSource(src, ".").success shouldBe false
  }

  test("discover: csv reports header columns; parquet reports typed schema") {
    val f = Files.createTempFile("disc-", ".csv")
    Files.writeString(f, "id,name,score\n1,a,2.5\n")
    val d = CheckDiscover.discoverSource(spark,
      srcFor(s"  files:\n    - {path: $f}"), ".")
    d.objects shouldBe Seq("id", "name", "score")
    val pq = CheckDiscover.discoverSource(spark,
      srcFor("  files:\n    - {path: /root/testdata/sf0.001/region.parquet}")
        .copy(connectorType = "parquet"), ".")
    pq.objects should contain("r_regionkey:int")
  }

  test("catalog: entity + tags + lineage pushed; failures non-fatal") {
    val contract = DataContract(name = "people", domain = Some("hr"),
      dataProduct = Some("core"), owner = Some("o@x"),
      fields = Seq(ContractField("id", "integer")))
    val client = new InMemoryCatalog
    val ok = CatalogFactory.pushAfterCommit(client, contract,
      Map("governance.domain" -> "hr"), Seq("csv.source"))
    ok shouldBe true
    client.entities.keySet shouldBe Set("hr.core.people")
    client.tags("hr.core.people")("governance.domain") shouldBe "hr"
    client.owners("hr.core.people") shouldBe "o@x"
    client.lineage.head shouldBe LineageEdge("csv.source", "hr.core.people")
    // a throwing client never fails the caller
    val bad = new CatalogClient {
      def ensureEntity(e: CatalogEntity): Unit = throw new RuntimeException("down")
      def pushTags(f: String, t: Map[String, String]): Unit = ()
      def pushOwner(f: String, o: String): Unit = ()
      def pushLineage(e: LineageEdge): Unit = ()
    }
    CatalogFactory.pushAfterCommit(bad, contract, Map.empty, Nil) shouldBe false
  }

  test("catalog factory: memory supported, http backends deployment-only") {
    CatalogFactory.forType("memory") shouldBe a[Some[_]]
    CatalogFactory.forType("openmetadata") shouldBe None
  }
}
