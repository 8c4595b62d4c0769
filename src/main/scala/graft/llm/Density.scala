package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-quantized density clustering (DBSCAN-style, Ester et al. 1996
  * re-expressed on an eps-grid): points are bucketed into eps-sized
  * cells; a cell is DENSE when its 3×3 cell neighborhood holds at least
  * `minPts` points (the grid form of the eps-ball core condition);
  * adjacent dense cells merge into clusters; points in non-dense cells
  * are noise. The cell quantization is the standard scale trick — it
  * replaces DBSCAN's per-point eps-range query (an all-pairs distance
  * join) with ONE hash aggregation and a constant-fanout (9-offset)
  * equi-join, at the cost of eps-granularity in the boundary (every
  * point within eps of a dense region's core still lands in or next to
  * a dense cell).
  *
  * Scale shape (the 100 TB lens): the only per-point work is one
  * projection to cell coordinates and one hash aggregation — linear
  * shuffle in point count, and the aggregation state is the OCCUPIED
  * CELL set, bounded by the data's spatial extent over eps², not by
  * point volume. Everything after (neighborhood sums, dense-cell
  * adjacency, connected components) runs on cells; components use
  * [[Dedup.connectedComponentsStar]] (O(log n) rounds, chain-safe).
  * The final assignment is one broadcast-sized left join from points to
  * the dense-cell label map. No window ever sees the point stream; no
  * cartesian/BNLJ appears on any path (the 8-adjacency join is an
  * equi-join on exploded offset keys).
  */
object Density {

  private val cellOffset = 1000000L
  private val cellMult = 4000000L

  /** Single-integer cell key: both coordinates offset non-negative then
    * mixed radix — collision-free for |cx|,|cy| < 1e6 (grid extents far
    * beyond any eps this operator is sane at). */
  private def cellCode(cx: Column, cy: Column): Column =
    (cx + lit(cellOffset)) * lit(cellMult) + (cy + lit(cellOffset))

  /** Cluster `points` — (idCol, x, y) with double coordinates — on an
    * eps-grid with the `minPts` 3×3 density threshold. Returns one row
    * per point: (idCol, cluster_id) where cluster_id is the minimum
    * dense-cell code of the point's component, or -1 for noise.
    * Deterministic and integer-exact after quantization: cell
    * coordinates come from one `floor(x / eps)` per axis (pure IEEE
    * double ops any engine replays bit for bit), and every later step
    * is integer arithmetic. */
  def gridDbscan(points: DataFrame, eps: Double, minPts: Int,
                 idCol: String = "id"): DataFrame = {
    require(eps > 0, "eps must be positive")
    require(minPts >= 1, "minPts must be >= 1")
    val pts = Caches.track(points.select(col(idCol),
      floor(col("x") / lit(eps)).cast("long").as("cx"),
      floor(col("y") / lit(eps)).cast("long").as("cy")))
    val cellCounts = Caches.track(
      pts.groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("cnt")))
    // 9-offset explode: each occupied cell contributes its count to its
    // 3×3 neighborhood targets; summing per target gives every cell's
    // neighborhood population in one equi-keyed aggregation.
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val contrib = cellCounts
      .select(explode(offsets).as("o"), col("cx"), col("cy"), col("cnt"))
      .select((col("cx") + col("o.dx")).as("tx"),
        (col("cy") + col("o.dy")).as("ty"), col("cnt"))
      .groupBy(col("tx"), col("ty")).agg(sum(col("cnt")).as("ncnt"))
    val dense = Caches.track(cellCounts
      .join(contrib, col("cx") === col("tx") && col("cy") === col("ty"))
      .filter(col("ncnt") >= lit(minPts.toLong))
      .select(col("cx"), col("cy"), cellCode(col("cx"), col("cy")).as("code")))
    // dense-cell adjacency (8-neighborhood incl. self-loop, which the
    // components loop drops): explode each dense cell's 9 neighbor slots
    // and equi-join back on the dense set
    val probes = dense
      .select(explode(offsets).as("o"), col("cx"), col("cy"), col("code"))
      .select((col("cx") + col("o.dx")).as("tx"),
        (col("cy") + col("o.dy")).as("ty"), col("code").as("d1"))
    val edges = probes.join(dense,
        col("tx") === col("cx") && col("ty") === col("cy"))
      .select(col("d1"), col("code").as("d2"))
    val labels = Dedup.connectedComponentsStar(edges)
      .select(col("doc_id").as("code"), col("cluster_id"))
    pts.withColumn("code", cellCode(col("cx"), col("cy")))
      .join(labels, Seq("code"), "left")
      .select(col(idCol), coalesce(col("cluster_id"), lit(-1L)).as("cluster_id"))
  }
}
