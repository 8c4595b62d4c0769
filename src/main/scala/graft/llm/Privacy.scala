package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy audits over structured data — the tabular complement of the
  * text-side PII scrub (q_pii_scrub): before a table ships as training
  * data or a released artifact, measure how identifying its
  * quasi-identifier combinations are.
  *
  * All four operators are exact-integer (class sizes, distinct counts,
  * rung indexes, cross-multiplied EMD), so the DuckDB oracles replay
  * them bit for bit.
  *
  * Scale shape: every audit is ONE hash aggregate keyed by the
  * quasi-identifier tuple (map-side combinable; only the QI tuple + id
  * shuffles, never payload columns); the generalization walk adds one
  * 1-row min() collect per ladder rung (bounded driver state, bounded
  * rungs). No windows over the table; the only cross join is
  * t-closeness's bounded classes × buckets grid (aggregate-sized, by
  * construction).
  *
  * Reference anchor: repype has no privacy stages; these are the
  * release-gate stages an LLM-data user of the reference would hand-write
  * (published: Sweeney 2002 k-anonymity; Machanavajjhala et al. 2007
  * l-diversity; Sweeney's Datafly generalization walk; Li, Li &
  * Venkatasubramanian 2007 t-closeness).
  */
object Privacy {

  /** k-anonymity audit (Sweeney, IJUFKS 2002): one row per
    * quasi-identifier equivalence class with its size and whether it
    * meets the k bar. A class below k means those rows are re-identifiable
    * by joining the QI tuple against an external table. */
  def kAnonymity(df: DataFrame, quasi: Seq[String], k: Int): DataFrame =
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("k_anon", col("class_size") >= k)

  /** Distinct l-diversity audit (Machanavajjhala et al., ICDE 2006/TKDD
    * 2007): a k-anonymous class still leaks when everyone in it shares
    * one sensitive value — each class must carry >= l DISTINCT sensitive
    * values. `sensitive` is any derivation column (e.g. a value band). */
  def lDiversity(df: DataFrame, quasi: Seq[String], sensitive: Column,
                 l: Int): DataFrame =
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("n_sensitive"))
      .withColumn("l_diverse", col("n_sensitive") >= l)

  /** Datafly-style global generalization walk (Sweeney 2002): `ladder`
    * lists full-domain generalization rungs, most specific first; each
    * rung is the complete (name, derivation) list for the QI columns.
    * Rows generalize at the FIRST rung whose minimum class size reaches
    * k (the last rung is taken unconditionally if none does — callers
    * end the ladder with full suppression). Returns the class table at
    * the chosen rung plus the rung index.
    *
    * The walk is at most `ladder.size` aggregate passes, each collecting
    * ONE driver row — the published sequential loop is over RUNGS (a
    * handful), never over data. */
  def generalizeToK(df: DataFrame, ladder: Seq[Seq[(String, Column)]],
                    k: Int): DataFrame = {
    require(ladder.nonEmpty, "generalizeToK: empty ladder")
    def classes(rung: Seq[(String, Column)]): DataFrame =
      df.groupBy(rung.map { case (n, c) => c.as(n) }: _*)
        .agg(count(lit(1)).as("class_size"))
    val found = ladder.indexWhere { rung =>
      // min over zero classes (empty input) is null — a null minimum
      // never satisfies a rung, so an empty frame falls through to the
      // terminal full-suppression rung instead of NPE-ing.
      val m = classes(rung).agg(min(col("class_size"))).head
      Option(m.get(0)).exists(_.asInstanceOf[Long] >= k)
    }
    val idx = if (found < 0) ladder.size - 1 else found
    classes(ladder(idx)).withColumn("rung", lit(idx.toLong))
  }

  /** t-closeness audit for an ORDERED sensitive attribute (Li, Li &
    * Venkatasubramanian, ICDE 2007) — the rung above l-diversity: a
    * class can be l-diverse yet still leak when its sensitive
    * DISTRIBUTION skews far from the table's. The ordered-attribute
    * earth-mover's distance is the published closed form
    * EMD = (1/(m−1))·Σ_b |cum_class(b) − cum_global(b)| over the m
    * ordered buckets. The per-bucket terms and their sum are
    * integer-exact via cross-multiplication (|cumC·N − cumG·n_c|, pure
    * BIGINT — `emd_num` is bounded by m·n_c·N, safe to ~4e17 row-pair
    * products); only the final ratio is ONE stated-order IEEE
    * expression over those exact integers (emd_num/(m−1)/n_c/N·1e6,
    * floored) — a `·1e6` BIGINT multiply would overflow six orders of
    * magnitude earlier. No float distribution ever materializes, and
    * both engines replay the same double ops bit for bit.
    *
    * Scale shape: one (class, bucket) hash aggregation over the data
    * (linear shuffle), then everything runs on the classes × buckets
    * grid — |classes|·m rows, data-volume-independent; the zero-fill
    * grid join broadcasts the bucket list and the cumulative windows
    * partition per class over ≤ m rows. */
  def tCloseness(df: DataFrame, quasi: Seq[String], sensitive: Column,
                 tMicro: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(quasi.map(col) :+ sensitive.as("bucket"): _*)
    val cells = Caches.track(
      base.groupBy((quasi.map(col) :+ col("bucket")): _*)
        .agg(count(lit(1)).as("cnt")))
    val buckets = cells.groupBy(col("bucket"))
      .agg(sum(col("cnt")).as("gcnt"))
    val classes = cells.groupBy(quasi.map(col): _*)
      .agg(sum(col("cnt")).as("class_size"))
    // zero-filled grid: every class × every global bucket — a DELIBERATE
    // broadcast cross of two bounded aggregates (|classes| × m rows,
    // the q_embed_covariance pattern), never data-sized
    val grid = classes.crossJoin(broadcast(buckets))
      .join(cells, quasi :+ "bucket", "left")
      .na.fill(0L, Seq("cnt"))
    val wCum = Window.partitionBy(quasi.map(col): _*)
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(quasi.map(col): _*)
    val terms = grid
      .withColumn("cum_c", sum(col("cnt")).over(wCum))
      .withColumn("cum_g", sum(col("gcnt")).over(wCum))
      .withColumn("n_total", sum(col("gcnt")).over(wAll))
      .withColumn("m", count(lit(1)).over(wAll))
    terms.groupBy((quasi.map(col) :+ col("class_size")): _*)
      .agg(
        sum(abs(col("cum_c") * col("n_total")
          - col("cum_g") * col("class_size"))).as("emd_num"),
        first(col("m")).as("m"),
        first(col("n_total")).as("n_total"))
      .withColumn("emd_micro", expr(
        "CAST(floor(CAST(emd_num AS DOUBLE)" +
          " / CAST(greatest(m - 1, 1L) AS DOUBLE)" +
          " / CAST(class_size AS DOUBLE) / CAST(n_total AS DOUBLE)" +
          " * 1000000.0) AS BIGINT)"))
      .withColumn("t_close", col("emd_micro") <= tMicro)
      .select((quasi.map(col) :+ col("class_size") :+ col("emd_micro")
        :+ col("t_close")): _*)
  }
}
