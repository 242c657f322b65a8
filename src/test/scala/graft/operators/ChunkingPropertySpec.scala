package graft.operators

import graft.SparkSpec

/** Randomized invariants for chunking and packing (seeded — fully
  * deterministic). These are the algebraic properties a user relies on:
  * chunks reconstruct the document, packing preserves and exactly
  * partitions the token stream.
  */
class ChunkingPropertySpec extends SparkSpec {

  import spark.implicits._

  private val rng = new scala.util.Random(42)

  test("chunks reconstruct the original token stream for random configs") {
    for (_ <- 1 to 8) {
      val n = 1 + rng.nextInt(60)
      val maxTokens = 2 + rng.nextInt(12)
      val overlap = rng.nextInt(maxTokens) // < maxTokens
      val stride = maxTokens - overlap
      val doc = (0 until n).map(i => s"t$i").mkString(" ")
      val chunks = Chunking.chunkByTokens(
          Seq((1L, doc)).toDF("doc_id", "text"), "doc_id", "text",
          maxTokens, overlap)
        .orderBy("chunk_idx").collect()
        .map(r => (r.getLong(1), r.getString(2).split(" ").toSeq))
      withClue(s"n=$n maxTokens=$maxTokens overlap=$overlap: ") {
        // expected chunk count
        val expChunks = 1 + math.ceil(math.max(0, n - maxTokens).toDouble / stride).toInt
        chunks.length shouldBe expChunks
        // chunk i starts at i*stride and has the right window
        chunks.foreach { case (idx, toks) =>
          toks shouldBe (0 until n).map(i => s"t$i")
            .slice((idx * stride).toInt, (idx * stride).toInt + maxTokens)
        }
        // dropping each non-first chunk's overlap reconstructs the doc
        val rebuilt = chunks.flatMap { case (idx, toks) =>
          if (idx == 0L) toks else toks.drop(overlap)
        }
        rebuilt shouldBe (0 until n).map(i => s"t$i")
      }
    }
  }

  test("packing exactly partitions each group's token stream, in order") {
    for (_ <- 1 to 5) {
      val seqLen = 3 + rng.nextInt(10)
      val docs = (0 until 2).flatMap { g =>
        (0 until 1 + rng.nextInt(6)).map { d =>
          val n = 1 + rng.nextInt(15)
          (g * 100L + d, (0 until n).map(i => s"g${g}d${d}w$i").mkString(" "), s"grp$g")
        }
      }
      val out = Chunking.packSequences(
          docs.toDF("doc_id", "text", "source"), "doc_id", "text", "source", seqLen)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .groupBy(_._1)
      withClue(s"seqLen=$seqLen docs=${docs.map(_._1)}: ") {
        for ((g, rows) <- out) {
          val sorted = rows.sortBy(_._2)
          // seq ids are contiguous from 0
          sorted.map(_._2) shouldBe sorted.indices.map(_.toLong).toArray
          // every sequence but the last is exactly seqLen; counts match text
          sorted.dropRight(1).foreach(_._4 shouldBe seqLen.toLong)
          sorted.foreach { case (_, _, text, nTok) =>
            text.split(" ").length.toLong shouldBe nTok
          }
          // concatenation in seq order == concatenation of docs in id order
          val rebuilt = sorted.flatMap(_._3.split(" ")).toSeq
          val expected = docs.filter(_._3 == g).sortBy(_._1)
            .flatMap(_._2.split(" "))
          rebuilt shouldBe expected
        }
      }
    }
  }

  test("BPE detokenize(tokenize(x)) round-trips whitespace-normalized text") {
    // random merge tables over a small alphabet; the marker discipline
    // must reassemble the exact (single-space) text regardless of how
    // the merges segment it
    val alphabet = "abcd"
    for (trial <- 1 to 6) {
      val words = (0 until 1 + rng.nextInt(8)).map { _ =>
        (0 until 1 + rng.nextInt(5))
          .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
      }
      val text = words.mkString(" ")
      val merges = (0 until rng.nextInt(12)).map { _ =>
        val a = if (rng.nextBoolean()) graft.functions.BpeTokens.Marker
          else alphabet(rng.nextInt(alphabet.length)).toString
        val b = (0 until 1 + rng.nextInt(2))
          .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
        (a, b)
      }
      val tok = BpeTokenizer(merges)
      withClue(s"trial $trial text='$text' merges=$merges: ") {
        val out = Seq(Tuple1(text)).toDF("text")
          .select(tok.detokenize(tok.tokenize(org.apache.spark.sql.functions.col("text"))))
          .collect()(0).getString(0)
        out shouldBe text
      }
    }
  }
}
