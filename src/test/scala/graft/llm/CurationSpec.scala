package graft.llm

import graft.SparkSpec

/** Ground truth for the round-12 session-2 curation tier: paragraph-level
  * dedup (Dolma keep-first semantics, hand-unrolled). */
class CurationSpec extends SparkSpec {

  test("paragraphDedup: duplicated paragraphs survive only at their " +
    "minimum (doc_id, pos) occurrence; docs rebuild in position order") {
    import SparkSpec.spark.implicits._
    val docs = Seq(
      (1L, "a b c d a b"), // paras: "a b" | "c d" | "a b" (self-dup)
      (2L, "c d x"),       // paras: "c d" (loses to doc 1) | "x"
      (3L, "a b"))         // single para, all lost -> empty rebuild
      .toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(docs, paraTokens = 2)
      .orderBy("doc_id")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got === Array(
      (1L, 3L, 2L, "a b c d"),
      (2L, 2L, 1L, "x"),
      (3L, 1L, 0L, "")))
  }

  test("paragraphDedup: short tail paragraph kept; whitespace-only doc " +
    "yields one empty paragraph (not zero rows)") {
    import SparkSpec.spark.implicits._
    val docs = Seq((1L, "p q r"), (2L, " ")).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(docs, paraTokens = 2)
      .orderBy("doc_id")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got === Array(
      (1L, 2L, 2L, "p q r"),
      (2L, 1L, 1L, "")))
  }
}
