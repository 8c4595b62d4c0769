package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an `embedding: array<float>` column.
  *
  * Scale design: the brute-force path broadcasts the (small) query set and
  * streams the corpus once — correct baseline at any corpus size as long as
  * |queries| is broadcastable. The LSH path is the scale-out variant: both
  * sides hash to `tables × bucket` keys, so the join is a bucket equi-join
  * touching only colliding candidates (tunable recall/cost via
  * planes/tables). Cosine math is done with codegen'd higher-order
  * functions (`zip_with`/`aggregate`) — no UDFs, no driver collection.
  */
object Similarity {

  /** Sequential dot product in double precision — a native codegen'd
    * expression (graft.functions.DotProductExpr) rather than a
    * zip_with/aggregate fold: same element-order accumulation (so DuckDB's
    * sequential `list_dot_product` stays bit-identical), none of the
    * per-element interpreted-lambda cost. */
  private[llm] def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotProduct(a, b)

  private[llm] def l2norm(v: Column): Column = sqrt(dot(v, v))

  private[llm] def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (excluding itself). Query side is broadcast; ranking is
    * a per-query window on the raw similarity with id tie-break.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("c_vec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_raw").desc, col("cand_id"))
    c.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .withColumn("cos_raw", cosine(col("q_vec"), col("c_vec")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("cand_id"),
        round(col("cos_raw"), 4).as("cos_sim"))
  }

  /** Global top-k most-similar pairs (embedding near-dup detection).
    * All-pairs formulation — only for corpora small enough to broadcast;
    * at scale use [[lshTopK]] / banded candidates instead.
    */
  def topPairs(embeddings: DataFrame, k: Int,
               vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val a = embeddings.select(col(idCol).as("d1"), col(vecCol).as("v1"))
    val b = embeddings.select(col(idCol).as("d2"), col(vecCol).as("v2"))
    a.join(b, col("d1") < col("d2"))
      .withColumn("cos_raw", cosine(col("v1"), col("v2")))
      .orderBy(col("cos_raw").desc, col("d1"), col("d2"))
      .limit(k)
      .select(col("d1"), col("d2"), round(col("cos_raw"), 4).as("cos_sim"))
  }

  /** Deterministic random hyperplanes for sign-LSH, from a fixed seed. */
  private[llm] def hyperplanes(tables: Int, planes: Int, dim: Int,
                               seed: Long = 42L): Seq[Seq[Seq[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(tables, planes, dim)(rnd.nextGaussian())
  }

  /** Sign-LSH bucket keys: one int key per table, bit p set iff
    * dot(vec, plane_p) >= 0. Pure per-row expression work. */
  private[llm] def lshKeys(vecCol: Column, planes: Seq[Seq[Seq[Double]]]): Column =
    array(planes.map { tablePlanes =>
      tablePlanes.zipWithIndex.map { case (plane, p) =>
        when(dot(vecCol, typedLit(plane)) >= 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
    }: _*)

  /** Approximate top-k via random-hyperplane LSH: candidates = corpus
    * vectors sharing ≥1 table bucket with the query, then exact cosine +
    * per-query window rank on candidates only. Increasing `tables` raises
    * recall, increasing `planes` shrinks buckets (cost).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int, tables: Int,
              vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dim = 64
    val hp = hyperplanes(tables, planes, dim)
    def withKeys(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
          posexplode(lshKeys(col(vecCol), hp)))
        .withColumnRenamed("pos", "table_id")
        .withColumnRenamed("col", "bucket")
    val q = withKeys(queries, "query_id", "q_vec")
    val c = withKeys(corpus, "cand_id", "c_vec")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_raw").desc, col("cand_id"))
    q.join(c, Seq("table_id", "bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), col("q_vec"), col("c_vec"))
      .distinct() // a pair may collide in several tables
      .withColumn("cos_raw", cosine(col("q_vec"), col("c_vec")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("cand_id"),
        round(col("cos_raw"), 4).as("cos_sim"))
  }
}
