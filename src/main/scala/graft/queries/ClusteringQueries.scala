package graft.queries

import org.apache.spark.sql.functions._

import graft.llm.Density

/** Density clustering over the `embeddings` table's first two
  * coordinates (the 2-D slice makes the eps-grid geometry honest; the
  * operator itself is dimension-agnostic in x/y). The corpus is one
  * unimodal blob, so the fixture PLANTS a second mode — labels ≥ 8
  * shift +2.0 in x on BOTH engines (pure double addition, replayed bit
  * for bit) — and the query must recover exactly the two planted modes
  * as separate clusters with the sparse fringe as noise.
  */
object ClusteringQueries {
  import Tables.load

  val queries: Seq[QueryDef] = Seq(

    // Grid-DBSCAN (Density.gridDbscan): eps = 0.05, minPts = 12 over the
    // 3×3 cell neighborhood. Output: every point's cluster label
    // (component-minimum dense-cell code) or -1 noise. The oracle
    // replays the whole pipeline — quantization, neighborhood sums,
    // dense threshold, and the component labels via a recursive-CTE
    // label propagation (min reachable cell code).
    QueryDef(
      "q_cluster_density",
      (s, dir) => {
        val pts = load(s, dir, "embeddings").select(col("vec_id"),
          (col("embedding").getItem(0).cast("double") +
            when(col("label") >= 8, lit(2.0)).otherwise(lit(0.0))).as("x"),
          col("embedding").getItem(1).cast("double").as("y"))
        Density.gridDbscan(pts, eps = 0.05, minPts = 12, idCol = "vec_id")
          .orderBy(col("vec_id"))
      },
      Some("""WITH RECURSIVE p AS (
             |  SELECT vec_id,
             |    CAST(floor((CAST(embedding[1] AS DOUBLE)
             |      + CASE WHEN label >= 8 THEN 2.0 ELSE 0.0 END) / 0.05)
             |      AS BIGINT) AS cx,
             |    CAST(floor(CAST(embedding[2] AS DOUBLE) / 0.05)
             |      AS BIGINT) AS cy
             |  FROM embeddings),
             |c AS (
             |  SELECT cx, cy, count(*) AS cnt FROM p GROUP BY cx, cy),
             |n AS (
             |  SELECT c.cx, c.cy,
             |    CAST(sum(c2.cnt) AS BIGINT) AS ncnt
             |  FROM c JOIN c c2
             |    ON abs(c.cx - c2.cx) <= 1 AND abs(c.cy - c2.cy) <= 1
             |  GROUP BY c.cx, c.cy),
             |d AS (
             |  SELECT cx, cy,
             |    (cx + 1000000) * 4000000 + (cy + 1000000) AS code
             |  FROM n WHERE ncnt >= 12),
             |e AS (
             |  SELECT a.code AS src, b.code AS dst
             |  FROM d a JOIN d b
             |    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1),
             |r(code, lab) AS (
             |  SELECT code, code FROM d
             |  UNION
             |  SELECT e.dst, r.lab FROM r JOIN e ON e.src = r.code),
             |m AS (
             |  SELECT code, min(lab) AS lab FROM r GROUP BY code)
             |SELECT p.vec_id,
             |  COALESCE(m.lab, -1) AS cluster_id
             |FROM p LEFT JOIN m
             |  ON m.code = (p.cx + 1000000) * 4000000 + (p.cy + 1000000)
             |ORDER BY p.vec_id""".stripMargin)),
  )
}
