package graft.queries

import org.apache.spark.sql.functions._

/** SQL front-end surface: queries a reference user would type rather than
  * build — correlated scalar subqueries, EXISTS/NOT EXISTS, lateral joins,
  * recursive CTEs. All run through `spark.sql` over registered temp views,
  * exercising the parser/analyzer path (subquery decorrelation, lateral
  * join planning, recursion) instead of the DataFrame builder API.
  *
  * Catalyst decorrelates each subquery into a join (no per-row re-execution
  * — the 100 TB shape); the recursive CTE iterates unions with a recursion
  * depth guard.
  */
object SqlQueries {

  private def sql(s: org.apache.spark.sql.SparkSession, dir: String,
                  q: String): org.apache.spark.sql.DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q)
  }

  val queries: Seq[QueryDef] = Seq(

    // Correlated scalar subquery → decorrelated into an aggregate + join.
    QueryDef(
      "q_scalar_subquery",
      (s, dir) => sql(s, dir,
        """SELECT p_partkey,
          |  round((SELECT avg(p2.p_retailprice) FROM part p2
          |         WHERE p2.p_brand = p1.p_brand), 2) AS brand_avg
          |FROM part p1 ORDER BY p_partkey""".stripMargin),
      Some("""SELECT p_partkey,
             |  round((SELECT avg(p2.p_retailprice) FROM part p2
             |         WHERE p2.p_brand = p1.p_brand), 2) AS brand_avg
             |FROM part p1 ORDER BY p_partkey""".stripMargin)),

    // EXISTS / NOT EXISTS → semi / anti joins after decorrelation.
    QueryDef(
      "q_exists_subquery",
      (s, dir) => sql(s, dir,
        """SELECT c_custkey, c_mktsegment
          |FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o
          |              WHERE o.o_custkey = c.c_custkey
          |                AND o.o_totalprice > 300000)
          |  AND NOT EXISTS (SELECT 1 FROM orders o2
          |                  WHERE o2.o_custkey = c.c_custkey
          |                    AND o2.o_orderstatus = 'P')
          |ORDER BY c_custkey""".stripMargin),
      Some("""SELECT c_custkey, c_mktsegment
             |FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey
             |                AND o.o_totalprice > 300000)
             |  AND NOT EXISTS (SELECT 1 FROM orders o2
             |                  WHERE o2.o_custkey = c.c_custkey
             |                    AND o2.o_orderstatus = 'P')
             |ORDER BY c_custkey""".stripMargin)),

    // Lateral correlated subquery (per-group top-N as a join operand).
    QueryDef(
      "q_lateral_join",
      (s, dir) => sql(s, dir,
        """SELECT n.n_name, t.c_custkey, t.c_acctbal
          |FROM nation n,
          |  LATERAL (SELECT c_custkey, c_acctbal FROM customer c
          |           WHERE c.c_nationkey = n.n_nationkey
          |           ORDER BY c_acctbal DESC, c_custkey LIMIT 2) AS t
          |ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin),
      Some("""SELECT n.n_name, t.c_custkey, t.c_acctbal
             |FROM nation n,
             |  LATERAL (SELECT c_custkey, c_acctbal FROM customer c
             |           WHERE c.c_nationkey = n.n_nationkey
             |           ORDER BY c_acctbal DESC, c_custkey LIMIT 2) AS t
             |ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin)),

    // Recursive CTE (Spark 4 WITH RECURSIVE): running-total day series —
    // recursion exercised on the engine, closed form for the oracle.
    QueryDef(
      "q_recursive_cte",
      (s, dir) => sql(s, dir,
        """WITH RECURSIVE seq(n, total) AS (
          |  SELECT 1, 1
          |  UNION ALL
          |  SELECT n + 1, total + n + 1 FROM seq WHERE n < 50)
          |SELECT n, total FROM seq ORDER BY n""".stripMargin),
      Some("""WITH RECURSIVE seq(n, total) AS (
             |  SELECT 1, 1
             |  UNION ALL
             |  SELECT n + 1, total + n + 1 FROM seq WHERE n < 50)
             |SELECT n, total FROM seq ORDER BY n""".stripMargin)),
  )
}
