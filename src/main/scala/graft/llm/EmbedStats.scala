package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed second-moment statistics over an embedding column — the
  * inputs to whitening/PCA preprocessing of a vector corpus (mean-center,
  * decorrelate, rescale before indexing or clustering). The covariance of
  * a d-dim embedding column is a d×d matrix; for corpus-scale d (64-1024)
  * that is KB-sized driver-free state while the data is TB-sized, so the
  * right shape is one aggregation pass, never a driver-side accumulation.
  */
object EmbedStats {

  /** Upper-triangle population covariance of `vecCol` in ONE aggregation
    * pass: each row expands in-place to its d(d+1)/2 index pairs
    * (i ≤ j) carrying xᵢ·xⱼ, xᵢ, xⱼ, and a single map-side-combined hash
    * aggregate reduces them to per-(i,j) sums — cov = E[xy] − E[x]E[y]
    * needs no second scan and no means join because every (i,j) group
    * sees all n rows' xᵢ and xⱼ. Shuffle volume is partitions × d(d+1)/2
    * rows regardless of corpus size (the explode amplification dies in
    * the partial aggregate), which is why this beats the self-join
    * formulation the DuckDB oracle states: a join of the exploded table
    * with itself would shuffle d·n rows twice.
    *
    * Sums are rounded to `roundTo` decimals AFTER the divide — double
    * aggregation order differs between engines and runs, but the values
    * are O(1e-1) with 1e-16 relative error, orders of magnitude inside
    * the rounding.
    */
  def covarianceUpperTriangle(embeddings: DataFrame,
                              vecCol: String = "embedding",
                              roundTo: Int = 6): DataFrame =
    embeddings
      .select(explode(expr(
        s"""flatten(transform(sequence(0, size($vecCol) - 1), i ->
           |  transform(sequence(i, size($vecCol) - 1), j ->
           |    named_struct(
           |      'i', i, 'j', j,
           |      'xy', cast($vecCol[i] as double) * cast($vecCol[j] as double),
           |      'xi', cast($vecCol[i] as double),
           |      'xj', cast($vecCol[j] as double)))))""".stripMargin))
        .as("p"))
      .select(col("p.i").cast("long").as("i"),
        col("p.j").cast("long").as("j"),
        col("p.xy"), col("p.xi"), col("p.xj"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"), sum(col("xy")).as("sxy"),
        sum(col("xi")).as("sxi"), sum(col("xj")).as("sxj"))
      .select(col("i"), col("j"),
        // + 0.0 collapses IEEE negative zero: a tiny negative covariance
        // rounds to -0.0, which formats differently from 0.0 ("-0" vs
        // "0") depending on which side of zero each engine's sum landed
        (round(col("sxy") / col("n")
          - (col("sxi") / col("n")) * (col("sxj") / col("n")), roundTo)
          + lit(0.0)).as("cov"))
}
