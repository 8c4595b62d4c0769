package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Grid-DBSCAN semantics the q_cluster_density oracle data may not
  * isolate: exact two-blob recovery, the noise contract, singleton
  * dense cells, and the neighborhood (not per-cell) density rule. */
class DensitySpec extends SparkSpec {

  private def pts(rows: Seq[(Long, Double, Double)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "x", "y")
  }

  private def run(rows: Seq[(Long, Double, Double)], eps: Double,
                  minPts: Int): Map[Long, Long] =
    Density.gridDbscan(pts(rows), eps, minPts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two well-separated dense blobs get two distinct cluster labels; " +
      "an isolated point is noise") {
    // blob A: 4 points in cell (0,0); blob B: 4 points in cell (100,100);
    // one stray far from both
    val rows = (1L to 4L).map(i => (i, 0.01 * i, 0.01)) ++
      (5L to 8L).map(i => (i, 100.01 + 0.01 * (i - 5), 100.01)) :+
      (9L, 50.0, 50.0)
    val got = run(rows, eps = 1.0, minPts = 3)
    val aLabels = (1L to 4L).map(got).toSet
    val bLabels = (5L to 8L).map(got).toSet
    assert(aLabels.size === 1 && bLabels.size === 1)
    assert(aLabels != bLabels)
    assert(got(9L) === -1L)
  }

  test("density counts the 3x3 NEIGHBORHOOD: points split across " +
      "adjacent cells still form one cluster") {
    // 2 points per cell in cells (0,0) and (1,0): neither cell alone has
    // minPts=4, the shared neighborhood does — one cluster, no noise
    val rows = Seq((1L, 0.1, 0.1), (2L, 0.2, 0.2),
      (3L, 1.1, 0.1), (4L, 1.2, 0.2))
    val got = run(rows, eps = 1.0, minPts = 4)
    assert(got.values.toSet.size === 1)
    assert(!got.values.exists(_ == -1L))
  }

  test("a singleton dense cell (no dense neighbors) labels itself") {
    val rows = (1L to 5L).map(i => (i, 0.01 * i, 0.01)) :+ (6L, 10.0, 10.0)
    val got = run(rows, eps = 1.0, minPts = 5)
    assert((1L to 5L).map(got).toSet.size === 1)
    assert(got(6L) === -1L)
  }

  test("negative coordinates quantize with floor (not truncation): " +
      "points straddling zero land in distinct cells") {
    // x=-0.1 -> cell -1, x=+0.1 -> cell 0 under eps=1; both cells in one
    // neighborhood, so together they can clear minPts
    val rows = Seq((1L, -0.1, 0.5), (2L, -0.2, 0.5),
      (3L, 0.1, 0.5), (4L, 0.2, 0.5))
    val got = run(rows, eps = 1.0, minPts = 4)
    assert(got.values.toSet.size === 1)
    assert(!got.values.exists(_ == -1L))
  }
}
