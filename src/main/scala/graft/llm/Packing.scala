package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy sequence packing: assign documents to fixed-token-budget packs
  * (the "fill 4k-token training sequences from variable-length documents"
  * step of an LLM data pipeline).
  *
  * Scale design: packing is inherently sequential *within* a pack, so the
  * corpus is split into `numBuckets` deterministic buckets (`doc_id %
  * numBuckets`), each packed independently with a sorted greedy pass —
  * `groupByKey(bucket).flatMapSortedGroups(doc_id)` keeps the pass
  * streaming (iterator, never a materialized group) and the bucket count,
  * not the corpus size, bounds the parallelism limit. Pack ids are
  * `bucket * 2^40 + seq`, unique and reproducible run-to-run: same input →
  * same packs, which is what makes packed-corpus digests stable.
  *
  * Documents longer than the budget get a pack of their own (callers
  * truncate or split upstream — this operator never drops data).
  */
object Packing {

  final case class PackedDoc(doc_id: Long, n_tokens: Int, pack_id: Long,
                             pack_seq: Int)

  def packGreedy(documents: DataFrame, tokenBudget: Int, numBuckets: Int = 32,
                 textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(tokenBudget > 0 && numBuckets > 0)
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col(idCol).cast("long").as("doc_id"),
        size(split(col(textCol), "\\s+")).as("n_tokens"),
        pmod(col(idCol), lit(numBuckets.toLong)).cast("int").as("bucket"))
      .as[(Long, Int, Int)]
      .groupByKey(_._3)
      .flatMapSortedGroups($"doc_id") { (bucket: Int, docs: Iterator[(Long, Int, Int)]) =>
        var packSeq = 0L
        var used = 0
        var localIdx = 0
        docs.map { case (docId, nTokens, _) =>
          if (used > 0 && used + nTokens > tokenBudget) { packSeq += 1; used = 0; localIdx = 0 }
          used += nTokens
          val out = PackedDoc(docId, nTokens,
            bucket.toLong * (1L << 40) + packSeq, localIdx)
          localIdx += 1
          out
        }
      }
      .toDF()
  }
}
