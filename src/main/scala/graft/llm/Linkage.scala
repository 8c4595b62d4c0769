package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Record linkage (entity resolution) over structured records — the
  * merge/purge problem: the same real-world entity appears under several
  * noisy rows (typos, re-encodings) and the corpus needs ONE canonical id
  * per entity before counting, sampling, or joining.
  *
  * Shape: sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD 1995)
  * — sort by a discriminating key, compare only rows within a fixed-width
  * window of the sorted order — then exact edit-distance verification and
  * connected components. Candidate volume is n·(window−1) regardless of
  * key skew (the published advantage over token blocking, whose hot
  * blocks blow up quadratically).
  *
  * Scale shape: the sort is one distributed range-partitioned sort of
  * (key, id) rows (payload never sorts); the window join is an equi-join
  * on rank after a bounded explode of the window offsets, so only
  * (rank, id, key) triples shuffle; verification is a codegen'd
  * levenshtein per candidate (exact integer, engine-portable); clusters
  * come from the O(log n) large/small-star rounds in
  * [[Dedup.connectedComponentsStar]]. No window function over the corpus,
  * no cross join, no driver state.
  */
object Linkage {

  /** Deterministic dense ranks 0..n-1 in (key, id) order: one distributed
    * sort + zipWithIndex (the md5Ranks discipline — rank is the position
    * in the TOTAL order, independent of partition boundaries). */
  private def sortRanks(records: DataFrame, idCol: String,
                        keyCol: String): DataFrame = {
    val spark = records.sparkSession
    val sorted = records.select(col(idCol).as("id"), col(keyCol).as("key"))
      .orderBy(col("key"), col("id"))
    val schema = StructType(sorted.schema.fields).add("r", LongType,
      nullable = false)
    spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (row, i) =>
        Row.fromSeq(row.toSeq :+ i)
      }, schema)
  }

  /** Candidate pairs from one sorted-neighborhood pass: records whose
    * ranks differ by < `window` and whose keys are within `maxDist`
    * Levenshtein edits. Returns (id_a, id_b, dist) with id_a's rank below
    * id_b's. */
  def sortedNeighborhoodPairs(records: DataFrame, idCol: String,
                              keyCol: String, window: Int,
                              maxDist: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val ranked = Caches.track(sortRanks(records, idCol, keyCol))
    ranked
      .select(col("r"), col("id").as("id_a"), col("key").as("key_a"))
      .withColumn("rb", explode(sequence(col("r") + 1,
        col("r") + (window - 1))))
      .join(ranked.select(col("r").as("rb"), col("id").as("id_b"),
        col("key").as("key_b")), "rb")
      .withColumn("dist", levenshtein(col("key_a"), col("key_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Full resolution: every record labeled with its entity cluster id
    * (the minimum member id — matched groups collapse, singletons keep
    * their own id). */
  def resolveEntities(records: DataFrame, idCol: String, keyCol: String,
                      window: Int, maxDist: Int): DataFrame = {
    val pairs = sortedNeighborhoodPairs(records, idCol, keyCol, window,
      maxDist).select(col("id_a").as("d1"), col("id_b").as("d2"))
    val clusters = Dedup.connectedComponentsStar(pairs)
      .select(col("doc_id").as("ent_id"), col("cluster_id"))
    records.select(col(idCol).as("ent_id"))
      .join(clusters, Seq("ent_id"), "left")
      .select(col("ent_id"),
        coalesce(col("cluster_id"), col("ent_id")).as("cluster_id"))
  }
}
