package graft.operators

import graft.SparkSpec
import java.sql.Timestamp
import java.nio.file.Files

/** Golden tests for M1–M5 against markdown_kv.py semantics: front matter,
  * sections, `key:: value` continuation rules, value_json detection, ord
  * numbering, render format, and the S10 file source.
  */
class MarkdownKvSpec extends SparkSpec {
  import MarkdownKv._

  private val T0 = Timestamp.valueOf("2024-01-15 00:00:00")

  test("front matter extracted; YAML errors tolerated") {
    val (fm, rest) = extractFrontMatter("---\ntitle: Doc\nid: 7\n---\nbody:: x")
    val fmMap = fm.get.toMap[String, Any]
    fmMap("title") shouldBe "Doc"
    fmMap("id") shouldBe 7
    rest shouldBe "body:: x"
    extractFrontMatter("no front matter")._1 shouldBe None
  }

  test("sections split on #-headers; _default when none") {
    val s = extractSections("intro\n# A\na:: 1\n## B\nb:: 2")
    // content before the first header is dropped unless no headers exist
    s.map(x => (x.name, x.level)) shouldBe Seq(("A", 1), ("B", 2))
    extractSections("just text").map(_.name) shouldBe Seq("_default")
  }

  test("kv pairs: continuation lines, terminator lines, ord") {
    val kv = parseKvPairs(
      "a:: 1\nb:: first\n  second\n\n  third\nplain line\nc:: [1, 2]")
    kv.map(_.key) shouldBe Seq("a", "b", "c")
    kv(0).value shouldBe "1"
    kv(0).value_json shouldBe Some("1") // bare number IS json (json.loads)
    kv(1).value shouldBe "first\n  second\n\n  third"
    kv(1).value_json shouldBe None
    kv(2).value_json shouldBe Some("[1, 2]")
    kv.map(_.ord) shouldBe Seq(0L, 1L, 2L)
  }

  test("key cannot contain a single colon (URL lines don't match)") {
    parseKvPairs("http://x:: nope") shouldBe empty
    parseKvPairs("plain_key:: yes").head.key shouldBe "plain_key"
  }

  test("row_per_kv: global ord across front matter and sections") {
    val doc = "---\ndoc_id: doc-1\ntags: [a, b]\n---\n# S1\nk1:: v1\n# S2\nk2:: 42"
    val rows = parseToRowPerKv(doc, "doc-1", T0)
    rows.map(r => (r.section, r.key, r.value, r.ord)) shouldBe Seq(
      ("_front_matter", "doc_id", "doc-1", 0L),
      ("_front_matter", "tags", "['a', 'b']", 1L), // Python str(list) = repr
      ("S1", "k1", "v1", 2L),
      ("S2", "k2", "42", 3L))
    rows(1).value_json shouldBe Some("[\"a\", \"b\"]") // json.dumps
    rows(3).value_json shouldBe Some("42")
  }

  test("document_level: nested sections, title fallback to first section") {
    val doc = "# Intro\na:: 1\n## Conf\nb:: 2\nc:: 3"
    val d = parseToDocumentLevel(doc, "d9", T0)
    d.title shouldBe "Intro"
    d.sections.map(s => (s.section, s.level, s.kv.length)) shouldBe Seq(
      ("Intro", 1, 1), ("Conf", 2, 2))
    d.sections(1).kv.map(_.ord) shouldBe Seq(0L, 1L) // per-section ord
    d.raw_md shouldBe doc
  }

  test("document_level: title from front matter; kv-less sections dropped") {
    val doc = "---\ntitle: My Title\n---\n# Empty\nprose only\n# Full\nx:: 1"
    val d = parseToDocumentLevel(doc, "d1", T0)
    d.title shouldBe "My Title"
    d.sections.map(_.section) shouldBe Seq("Full")
  }

  test("render: front matter for id-ish fields, key:: value lines in order") {
    val md = renderRecord(Seq("doc_id" -> 5L, "name" -> "x", "score" -> 9.5))
    md shouldBe "---\ndoc_id: 5\n---\n\nname:: x\nscore:: 9.5"
    // no id-ish fields -> no front matter
    renderRecord(Seq("a" -> 1L)) shouldBe "a:: 1"
    // None -> empty, bool -> True/False, dict -> json.dumps
    renderRecord(Seq("v" -> null, "b" -> true, "m" -> Map("k" -> 1L))) shouldBe
      "v:: \nb:: True\nm:: {\"k\": 1}"
  }

  test("render/parse roundtrip through Spark layer") {
    import spark.implicits._
    val df = Seq((1L, "alice", 128L), (2L, "bob", 54L))
      .toDF("doc_id", "name", "n_chars")
    val rendered = MarkdownKv.toMarkdownKv(df)
    rendered.columns shouldBe Array("doc_id", "markdown_kv_content")
    val parsed = MarkdownKv.parseRowPerKv(rendered, "markdown_kv_content", "doc_id", T0)
      .collect().sortBy(r => (r.doc_id, r.ord))
    parsed.map(r => (r.doc_id, r.section, r.key, r.value)) shouldBe Array(
      ("1", "_front_matter", "doc_id", "1"),
      ("1", "_default", "name", "alice"),
      ("1", "_default", "n_chars", "128"),
      ("2", "_front_matter", "doc_id", "2"),
      ("2", "_default", "name", "bob"),
      ("2", "_default", "n_chars", "54"))
  }

  test("S10 source: reference sample doc parses (front matter + sections)") {
    val sample = java.nio.file.Paths.get(
      "/root/reference/tests/fixtures/seeds/markdown_kv/sample_doc.md")
    assume(Files.exists(sample))
    val dir = Files.createTempDirectory("mdkv-src-")
    Files.copy(sample, dir.resolve("sample_doc.md"))
    val rows = graft.sources.MarkdownKvSource
      .readRowPerKv(spark, Seq(dir.toString), T0)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    rows.map(_._1).distinct shouldBe Array("sample_doc")
    // the sample's "- **k**: v" lines are NOT key:: value pairs; only the
    // front matter yields rows (matches the reference regex exactly)
    rows.map(_._2).distinct shouldBe Array("_front_matter")
    rows.map(_._3) should contain allOf ("doc_id", "title", "author", "created")
  }

  test("document_level survives a Spark nested write/read") {
    import spark.implicits._
    val df = Seq(("d1", "---\ntitle: T\n---\n# A\nx:: 1")).toDF("id", "md")
    val ds = MarkdownKv.parseDocumentLevel(df, "md", "id", T0)
    val tmp = Files.createTempDirectory("mdkv-doc-").toString + "/out"
    ds.write.parquet(tmp)
    val back = spark.read.parquet(tmp)
    back.selectExpr("sections[0].section", "sections[0].kv[0].key")
      .collect()(0).toSeq shouldBe Seq("A", "x")
  }
}
