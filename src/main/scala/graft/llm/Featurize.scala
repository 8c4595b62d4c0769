package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-free document featurization: hashed TF-IDF vectors (feature
  * hashing, Weinberger et al., ICML 2009 — "the hashing trick") — the
  * deterministic embedding generator that lets the ANN/dedup tier run on
  * corpora that ship no model-produced vectors.
  *
  * Everything is exact-integer after one ln → 4 dp step (the Kneser-Ney
  * discipline), and the hash is md5-derived on BOTH engines, so the whole
  * featurization replays in DuckDB bit for bit.
  */
object Featurize {

  /** Feature index of a term under the hashing trick: the first 8 hex
    * chars of md5(term) as an unsigned 32-bit int, mod `dim`.
    * SQL mirror: `CAST('0x' || substr(md5(term), 1, 8) AS BIGINT) % dim`. */
  private[llm] def hashIndex(term: Column, dim: Int): Column =
    conv(substring(md5(term), 1, 8), 16, 10).cast("long") % dim

  /** The SIGN bit of the hashing trick (the 9th hex nibble's high bit):
    * Weinberger et al.'s signed hashing — collisions cancel in
    * expectation instead of accumulating. SQL mirror:
    * `CASE WHEN substr(md5(term), 9, 1) IN ('0'..'7') THEN 1 ELSE -1`. */
  private[llm] def hashSign(term: Column): Column =
    when(substring(md5(term), 9, 1).isin(
      "0", "1", "2", "3", "4", "5", "6", "7"), lit(1L)).otherwise(lit(-1L))

  /** Hashed TF-IDF document vectors, exploded sparse form: one row per
    * (doc_id, dim) with a non-zero component
    *
    *   w(d, i) = Σ_{t: h(t) = i} sign(t) · tf(t, d) · idf_micro(t)
    *
    * where idf_micro is sklearn's smooth idf `ln((N+1)/(df+1)) + 1` after
    * ln → 4 dp → 1e4 fixed-point (so every weight and component is an
    * exact BIGINT). Collisions are the hashing trick's contract: summed,
    * sign-balanced, bounded by `dim`.
    *
    * Scale shape: one token scan feeds tf and df; idf joins back by term
    * (vocabulary-bounded aggregate, never the corpus); the component
    * rollup is one hash aggregate keyed (doc, dim ≤ `dim`). Output is at
    * most `dim` rows per document at any corpus size. */
  def hashedTfidf(documents: DataFrame, dim: Int = 32,
                  textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    val toks = Caches.track(documents
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= ""))
    val n = documents.select(countDistinct(col(idCol)).as("n"))
    val df = toks.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val idf = df.crossJoin(broadcast(n))
      .select(col("term"),
        (round(round(log((col("n") + 1).cast("double")
            / (col("df") + 1).cast("double")), 4) * 10000).cast("long")
          + lit(10000L)).as("idf_micro"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    tf.join(idf, "term")
      .select(col("doc_id"),
        hashIndex(col("term"), dim).as("dim"),
        (hashSign(col("term")) * col("tf") * col("idf_micro")).as("w"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(sum(col("w")).as("w_micro"))
      .filter(col("w_micro") =!= 0)
  }

  /** DENSE hashed TF-IDF vectors: the sparse components assembled into a
    * fixed `dim`-length array<double> (exact — every component is an
    * integer) under the embeddings-table column contract (vec_id,
    * embedding), so the whole ANN tier composes directly on documents
    * that ship no model vectors. Documents whose every component
    * cancelled to zero are absent (they carry no usable signal — the
    * hashing-trick analogue of an empty text). One map-assembly
    * aggregate over the ≤ dim sparse rows per doc. */
  def hashedTfidfDense(documents: DataFrame, dim: Int = 32,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame =
    hashedTfidf(documents, dim, textCol, idCol)
      .groupBy(col("doc_id"))
      .agg(map_from_entries(
        collect_list(struct(col("dim"), col("w_micro")))).as("m"))
      .select(col("doc_id").as("vec_id"),
        transform(sequence(lit(0L), lit(dim - 1L)),
          i => coalesce(element_at(col("m"), i), lit(0L)).cast("double"))
          .as("embedding"))
}
