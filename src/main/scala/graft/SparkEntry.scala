package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator surface (SURVEY §2.b): each key
  * is one operator exercised end-to-end on the testdata tables; `oracleSql`
  * carries the equivalent DuckDB SQL: SQL-expressible ops replay their
  * full computation; hash-family ops (MinHash/SimHash/sign-LSH) are gated
  * by the planted-twin contract (closed-form survivals stated as VALUES),
  * so every query is hash-checked — none are rows-only.
  */
object SparkEntry {

  private val all: Seq[QueryDef] =
    RelationalQueries.queries ++
      AggQueries.queries ++
      WindowQueries.queries ++
      AnalyticQueries.queries ++
      SqlQueries.queries ++
      SourceQueries.queries ++
      FunctionQueries.queries ++
      EventQueries.queries ++
      LlmQueries.queries ++
      StreamingQueries.queries ++
      ExtensionQueries.queries ++
      SketchQueries.queries ++
      GraphAnnQueries.queries ++
      MiningQueries.queries ++
      CurationQueries.queries ++
      RetrievalQueries.queries ++
      ClusteringQueries.queries

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * TPC-H Q1 pricing summary (SURVEY §7.2 minimum slice). */
  def entry(spark: SparkSession): DataFrame =
    all.find(_.name == "q1_pricing").get.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.sql.map(q.name -> _)).toMap
}
