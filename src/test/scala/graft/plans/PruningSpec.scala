package graft.plans

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Partition-level scan pruning — the first-order lever at 100 TB (skip
  * whole directories, not just row groups). Static pruning: a literal
  * filter on the partition column must cut the partitions actually read
  * (scan metrics, not the pre-pruning file index). Dynamic partition
  * pruning: a selective dim-side filter must prune the fact scan at
  * runtime via the subquery/broadcast-reuse mechanism. */
class PruningSpec extends SparkSpec {

  private lazy val factPath = {
    val p = s"/root/repo/target/tmp/pruning_fact_${System.nanoTime()}"
    Tables.load(spark, sfDir, "orders")
      .withColumn("status", col("o_orderstatus"))
      .write.partitionBy("status").parquet(p)
    p
  }

  private def factScanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec
        if f.metadata.get("Location").exists(_.contains("pruning_fact")) => f }
      .getOrElse(fail("no fact FileSourceScan in plan"))

  test("static partition pruning: literal filter reads only its directory") {
    val expected = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderstatus") === "F").count()
    val scan = spark.read.parquet(factPath).filter(col("status") === "F")
    assert(scan.collect().length == expected)
    val fs = factScanOf(scan)
    // 3 status values exist on disk; the pruned scan must touch exactly 1
    assert(fs.metrics("numPartitions").value == 1,
      s"read ${fs.metrics("numPartitions").value} partitions")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "partition filter not pushed")
  }

  test("dynamic partition pruning: dim filter prunes the fact scan at runtime") {
    import SparkSpec.spark.implicits._
    // tiny test tables defeat the stats-based benefit heuristic — disable
    // it so the decision rides the fallback ratio, as it would with real
    // fact-table sizes
    val key = "spark.sql.optimizer.dynamicPartitionPruning.useStats"
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "false")
      // the dim must be file-backed: a local relation folds the filter
      // into itself (ConvertToLocalRelation), leaving no selective
      // predicate for DPP's pattern to find
      val dimPath = s"/root/repo/target/tmp/pruning_dim_${System.nanoTime()}"
      Seq(("F", "final"), ("O", "open"), ("P", "pending"))
        .toDF("status", "label").write.parquet(dimPath)
      val dim = spark.read.parquet(dimPath)
      val fact = spark.read.parquet(factPath)
      val joined = fact.join(dim, "status").filter(col("label") === "final")
      val expected = Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderstatus") === "F").count()
      assert(joined.collect().length == expected)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"no dynamic partition pruning in plan:\n${plan.take(2000)}")
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
