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

    // k-center greedy coreset selection (Gonzalez 1985 farthest-point,
    // the Sener-Savarese active-learning/coreset selector): 8 centers,
    // max-norm seed, farthest-point iterations over milli-quantized
    // integer distances (selection is exact BIGINT argmax — no float
    // comparison anywhere). The oracle replays all 8 steps unrolled
    // (generated CTE chain: running min-distance via least, argmax with
    // the id tie-break, selected ids excluded).
    QueryDef(
      "q_select_kcenter",
      (s, dir) => {
        graft.llm.Clustering.kCenterGreedy(
            load(s, dir, "embeddings"), "vec_id", "embedding", k = 8)
          .orderBy(col("step"))
      },
      Some(kCenterSql(8))),
  )

  /** Unrolled DuckDB replay of [[graft.llm.Clustering.kCenterGreedy]]:
    * quantize, max-norm seed, then k−1 (distance-update → excluded
    * argmax) rounds. */
  private def kCenterSql(k: Int): String = {
    val dist = (qvA: String, qvB: String) =>
      s"CAST(list_sum(list_transform(list_zip($qvA, $qvB), " +
        s"z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT)"
    val head =
      s"""WITH q AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
         |  FROM embeddings),
         |s0 AS (
         |  SELECT vec_id, qv FROM (
         |    SELECT vec_id, qv,
         |      CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT)
         |        AS s
         |    FROM q) ORDER BY s DESC, vec_id LIMIT 1),
         |d1 AS (
         |  SELECT q.vec_id, q.qv, ${dist("q.qv", "s0.qv")} AS md
         |  FROM q, s0)""".stripMargin
    val steps = (1 until k).map { i =>
      val excl = ("SELECT vec_id FROM s0" +:
        (1 until i).map(j => s"SELECT vec_id FROM c$j"))
        .mkString(" UNION ALL ")
      val pick =
        s"""c$i AS (
           |  SELECT vec_id, qv, md FROM d$i
           |  WHERE vec_id NOT IN ($excl)
           |  ORDER BY md DESC, vec_id LIMIT 1)""".stripMargin
      val update =
        if (i == k - 1) ""
        else s""",
           |d${i + 1} AS (
           |  SELECT d$i.vec_id, d$i.qv,
           |    least(d$i.md, ${dist(s"d$i.qv", s"c$i.qv")}) AS md
           |  FROM d$i, c$i)""".stripMargin
      pick + update
    }.mkString(",\n")
    val union = (s"SELECT 0 AS step, vec_id, CAST(0 AS BIGINT) AS d2_sel FROM s0" +:
      (1 until k).map(i =>
        s"SELECT $i AS step, vec_id, md AS d2_sel FROM c$i"))
      .mkString(" UNION ALL ")
    s"$head,\n$steps\nSELECT step, vec_id, d2_sel FROM ($union)\nORDER BY step"
  }
}
