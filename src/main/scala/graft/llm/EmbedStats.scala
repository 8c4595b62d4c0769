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

  /** Per-pair product sums: one map-side-combined hash aggregate over
    * the in-row expansion of each vector into its d(d+1)/2 index pairs
    * (i ≤ j) — the pair carries ONLY xᵢ·xⱼ. Shuffle volume is
    * partitions × d(d+1)/2 rows regardless of corpus size (the explode
    * amplification dies in the partial aggregate). Carrying xᵢ/xⱼ
    * through the expansion to save the means scan was A/B'd and lost:
    * the extra two doubles inflate the d²-amplified in-flight payload
    * ~45% while the means need only a d-amplified pass — measured 2.27 s
    * → 1.71 s at sf0.1 for the split form. */
  private def pairProducts(embeddings: DataFrame, vecCol: String): DataFrame =
    embeddings
      // empty arrays must contribute NOTHING: Spark's sequence(0, -1)
      // DESCENDS ([0, -1]), which would emit bogus (0,-1) pairs with
      // null products; null vectors drop here too (size(null) < 1)
      .filter(size(col(vecCol)) >= 1)
      .select(explode(expr(
        s"""flatten(transform(sequence(0, size($vecCol) - 1), i ->
           |  transform(sequence(i, size($vecCol) - 1), j ->
           |    named_struct(
           |      'i', i, 'j', j,
           |      'xy', cast($vecCol[i] as double) * cast($vecCol[j] as double)))))""".stripMargin))
        .as("p"))
      .select(col("p.i").cast("long").as("i"),
        col("p.j").cast("long").as("j"), col("p.xy"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"), sum(col("xy")).as("sxy"))

  /** Per-dimension means: the light d-amplified companion pass (64 rows
    * out — always broadcastable). */
  private def dimMeans(embeddings: DataFrame, vecCol: String): DataFrame =
    embeddings
      .filter(size(col(vecCol)) >= 1)
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("d", "x")))
      .groupBy(col("d")).agg(avg(col("x")).as("m"))

  /** Upper-triangle population covariance of `vecCol`:
    * cov(i,j) = E[xᵢxⱼ] − E[xᵢ]E[xⱼ] from the [[pairProducts]] aggregate
    * plus two broadcast joins against the d-row [[dimMeans]] table. Two
    * cheap column-pruned scans beat one scan that drags the means
    * through the d²-amplified expansion (see pairProducts); both beat
    * the self-join formulation the DuckDB oracle states, which would
    * shuffle d·n rows twice.
    *
    * Values are rounded to `roundTo` decimals AFTER the divide — double
    * aggregation order differs between engines and runs, but the values
    * are O(1e-1) with 1e-16 relative error, orders of magnitude inside
    * the rounding.
    *
    * REQUIRES uniform dimensionality: with ragged vectors each pair's
    * `n` counts only the vectors long enough to hold index j while the
    * means average over everyone holding each dim — the result would be
    * a silently inconsistent mix (the lazy plan cannot fail fast here;
    * [[pcaProject]], which does act, enforces the requirement with an
    * explicit error).
    */
  def covarianceUpperTriangle(embeddings: DataFrame,
                              vecCol: String = "embedding",
                              roundTo: Int = 6): DataFrame = {
    // ONE 1-row broadcast side: the means fold into a d-element array
    // (two separate broadcast joins would each re-run the means
    // aggregate — projections differ, so ReuseExchange cannot dedupe)
    val meansRow = dimMeans(embeddings, vecCol)
      .agg(expr("transform(array_sort(collect_list(struct(d, m)))," +
        " x -> x.m)").as("ms"))
    pairProducts(embeddings, vecCol)
      .crossJoin(broadcast(meansRow))
      .select(col("i"), col("j"),
        // + 0.0 collapses IEEE negative zero: a tiny negative covariance
        // rounds to -0.0, which formats differently from 0.0 ("-0" vs
        // "0") depending on which side of zero each engine's sum landed
        (round(col("sxy") / col("n")
          - element_at(col("ms"), col("i").cast("int") + 1)
          * element_at(col("ms"), col("j").cast("int") + 1), roundTo)
          + lit(0.0)).as("cov"))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix — the driver
    * step of [[pcaProject]]. Deterministic and dependency-free; d ≤ ~1k
    * makes this sub-second, and it runs on KB-scale state (the covariance
    * matrix), never on data. Returns (eigenvalues, eigenvector columns)
    * sorted by descending eigenvalue, each eigenvector sign-normalized
    * (largest-|component| entry positive) so the decomposition — and
    * every projection built from it — is reproducible run to run. */
  private[llm] def jacobiEigen(cov: Array[Array[Double]],
                               sweeps: Int = 16)
      : (Array[Double], Array[Array[Double]]) = {
    val d = cov.length
    val a = Array.tabulate(d, d)((i, j) => cov(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var done = false
    while (sweep < sweeps && !done) {
      var off = 0.0
      for (p <- 0 until d; q <- p + 1 until d) off += a(p)(q) * a(p)(q)
      if (off < 1e-18) done = true
      else {
        for (p <- 0 until d; q <- p + 1 until d)
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) { // A ← A·G
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) { // A ← Gᵀ·A
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) { // V ← V·G
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
        sweep += 1
      }
    }
    val order = (0 until d).sortBy(c0 => -a(c0)(c0))
    val vals = order.map(c0 => a(c0)(c0)).toArray
    val vecs = order.map { c0 =>
      val column = Array.tabulate(d)(i => v(i)(c0))
      val lead = column.indices.maxBy(i => math.abs(column(i)))
      if (column(lead) < 0) column.map(-_) else column
    }.toArray
    (vals, vecs)
  }

  /** PCA projection (optionally whitening): ONE pair-sum pass builds the
    * d×d covariance, the driver eigendecomposes it ([[jacobiEigen]] on
    * KB-scale state — the same bounded-driver contract as k-means
    * centroids or the BPE merge table), and every vector projects onto
    * the top `k` principal components in a second codegen'd pass with
    * the projection matrix inlined as literals (broadcast-by-plan, no
    * join). `whiten = true` rescales each component by 1/√eigenvalue —
    * unit variance per output dimension, the standard preprocessing
    * before cosine ANN or clustering on anisotropic embeddings.
    *
    * Returns (`idCol`, proj ARRAY of k doubles), one row per input row
    * with a non-empty vector — null/empty-vector rows are excluded from
    * the stats passes and from the projection alike. Not SQL-expressible
    * (the oracle cannot eigendecompose) — correctness is spec-gated in
    * LlmSpec: whitened output has identity covariance, the top component
    * recovers a planted dominant direction, and the projection is
    * deterministic.
    */
  def pcaProject(embeddings: DataFrame, k: Int,
                 vecCol: String = "embedding", idCol: String = "vec_id",
                 whiten: Boolean = false, eps: Double = 1e-9): DataFrame = {
    val stats = pairProducts(embeddings, vecCol).collect()
    require(stats.nonEmpty, "empty embedding input")
    val d = stats.map(_.getLong(1)).max.toInt + 1
    require(k >= 1 && k <= d, s"need 1 <= k <= $d, got $k")
    // uniform dimensionality required: with ragged vectors the per-pair
    // row counts diverge and a single n would silently skew the means
    require(stats.map(_.getLong(2)).distinct.length == 1,
      "ragged embedding input: all vectors must share one dimensionality")
    val n = stats.head.getLong(2).toDouble
    val means = new Array[Double](d)
    dimMeans(embeddings, vecCol).collect()
      .foreach(r => means(r.getInt(0)) = r.getDouble(1))
    val cov = Array.ofDim[Double](d, d)
    stats.foreach { r =>
      val (i, j) = (r.getLong(0).toInt, r.getLong(1).toInt)
      val c = r.getDouble(3) / n - means(i) * means(j)
      cov(i)(j) = c
      cov(j)(i) = c
    }
    val (vals, vecs) = jacobiEigen(cov)
    val meansLit = array(means.map(lit): _*)
    val centered = zip_with(col(vecCol).cast("array<double>"), meansLit,
      (x, m) => x - m)
    val projCols = (0 until k).map { c0 =>
      val scale = if (whiten) 1.0 / math.sqrt(math.max(vals(c0), eps)) else 1.0
      val w = array(vecs(c0).map(x => lit(x * scale)): _*)
      aggregate(zip_with(centered, w, (x, wi) => x * wi), lit(0.0),
        (acc, x) => acc + x)
    }
    // same row set the stats passes saw: a null/empty vector contributed
    // nothing to the covariance, and projecting it would zip_with-pad
    // with nulls and silently emit an all-null proj row
    embeddings.filter(size(col(vecCol)) >= 1)
      .select(col(idCol), array(projCols: _*).as("proj"))
  }
}
