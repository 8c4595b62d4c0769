package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftColumn
import org.apache.spark.sql.types.BinaryType

/** Distributed Bloom-filter build + membership probe, reusing the native
  * sketch expressions Spark's own runtime-filter optimization is built on
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the machinery
  * behind spark.sql.optimizer.runtime.bloomFilter) — exposed as library
  * operators so a pipeline can build a filter over one dataset and
  * prefilter another *before* a shuffle.
  *
  * Scale shape: the build is one partial→final typed aggregate (each task
  * fills a local sketch, merge is OR — no row ever leaves its partition);
  * only the finished ~KB-MB sketch lands on the driver, where it becomes a
  * plan literal. The probe is a per-row codegen'd predicate against that
  * literal — applied before an exchange it cuts the shuffled volume to the
  * true-hit rate + the false-positive rate.
  */
object BloomFunctions {

  /** Build a Bloom filter over `xxhash64(c)` across all rows of `df`,
    * distributed, and return the serialized sketch. `numBits` governs the
    * false-positive rate (~8 bits/item ≈ 2% FPP). */
  def buildBloom(df: DataFrame, c: Column, expectedItems: Long,
                 numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      GraftColumn.expression(xxhash64(c)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bytes = df.select(GraftColumn.column(agg).as("bloom"))
      .head().getAs[Array[Byte]](0)
    require(bytes != null, "bloom build over an empty/all-null input")
    bytes
  }

  /** Membership probe of `xxhash64(c)` against a serialized sketch from
    * [[buildBloom]]. No false negatives; false positives at the sketch's
    * configured rate — callers needing exact results confirm survivors
    * with an equi-join (see [[graft.llm.Contamination.sharedShinglesBloom]]). */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    GraftColumn.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      GraftColumn.expression(xxhash64(c))))
}
