package graft

import graft.sources.DocumentsJsonl
import java.nio.file.Files

class DocumentsJsonlSpec extends SparkTestBase {

  private def writeJsonl(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("jsonl")
    Files.writeString(dir.resolve("part-0.jsonl"),
      lines.mkString("\n") + "\n")
    dir.toString
  }

  test("valid lines parse, malformed lines are quarantined not fatal") {
    val path = writeJsonl(Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}""",
      """{"doc_id": 2, "text": "zweite zeile", "lang": "de", "source": "web"}""",
      """this is not json at all{{{""",
      """{"doc_id": 4, "lang": "en", "source": "web"}""",
      """{"doc_id": 5, "text": "extra ok", "lang": "fr", "source": "book", "unknown_field": 9}"""))
    val docs = DocumentsJsonl.documents(spark, path).orderBy("doc_id").collect()
    assert(docs.map(_.getLong(0)).toSeq == Seq(1L, 2L, 5L))
    assert(docs.head.getString(1) == "hello world")
    assert(docs.head.getLong(4) == 11L) // n_chars derived

    val stats = DocumentsJsonl.ingestStats(spark, path).head()
    assert(stats.getLong(0) == 5L) // lines
    assert(stats.getLong(1) == 1L) // corrupt
    assert(stats.getLong(2) == 1L) // missing text
    assert(stats.getLong(3) == 3L) // valid
  }

  test("jsonl docs flow into the curation pipeline unchanged") {
    val path = writeJsonl(Seq(
      """{"doc_id": 10, "text": "the cat is on the mat and it is fine", "lang": "en", "source": "web"}""",
      """{"doc_id": 11, "text": "der hund ist nicht mit das ein zu den", "lang": "de", "source": "web"}"""))
    val docs = DocumentsJsonl.documents(spark, path)
    val gate = graft.operators.TextAnalysis.qualityGate(docs, minTokens = 3)
      .orderBy("doc_id").collect()
    assert(gate.length == 2)
    assert(gate.head.getAs[Int]("keep") == 1)   // english doc passes
    assert(gate.last.getAs[Int]("ok_lang") == 0) // german doc fails the lang gate
  }
}
