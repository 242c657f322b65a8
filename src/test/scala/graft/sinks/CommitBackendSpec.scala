package graft.sinks

import graft.SparkSpec
import graft.core.{ContractField, DataContract}
import java.nio.file.Files

class CommitBackendSpec extends SparkSpec {
  import spark.implicits._

  private val contract = DataContract(name = "commit_t1",
    domain = Some("d"), dataProduct = Some("p"),
    fields = Seq(ContractField("id", "integer", required = true),
      ContractField("name", "string")))

  private def data = Seq((1L, "a"), (2L, "b")).toDF("id", "name")

  test("catalog backend: create-on-first-commit, append, property diff") {
    val backend = CatalogTableBackend("spark_catalog", "default")
    val r1 = backend.commit(data, "/unused", contract, Nil,
      Map("governance.owner" -> "o@x"), 150, None)
    r1.committed shouldBe true
    r1.location shouldBe "spark_catalog.default.commit_t1"
    spark.table(r1.location).count() shouldBe 2
    // second commit appends + sets only changed properties
    backend.commit(data, "/unused", contract, Nil,
      Map("governance.owner" -> "o@x", "finops.project" -> "apollo"), 150, None)
    spark.table(r1.location).count() shouldBe 4
    val props = spark.sql(s"SHOW TBLPROPERTIES ${r1.location}").collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    props("finops.project") shouldBe "apollo"
    props("governance.owner") shouldBe "o@x"
    props("write.target-file-size-bytes") shouldBe (150L * 1024 * 1024).toString
  }

  test("degradation: unknown catalog falls back to parquet-only, job succeeds") {
    val backend = CatalogTableBackend("no_such_catalog", "ns")
    val out = Files.createTempDirectory("degrade-").toString + "/t"
    val r = backend.commit(data, out, contract, Nil, Map("k" -> "v"), 150, None)
    r.committed shouldBe true
    r.backend shouldBe "parquet_only"
    spark.read.parquet(out).count() shouldBe 2
  }

  test("forTarget picks the catalog backend only when configured") {
    CommitBackend.forTarget(spark, Map.empty) shouldBe ParquetOnly
    CommitBackend.forTarget(spark,
      Map("name" -> "nessie", "namespace" -> "lake")) shouldBe
      CatalogTableBackend("nessie", "lake")
  }
}
