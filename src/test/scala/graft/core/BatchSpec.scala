package graft.core

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.DefaultStages

/** Mirrors tests/test_batch.py: discovery, parent linking, contexts,
  * pending transitions, run + abort-on-failure, status events. */
class BatchSpec extends SparkSpec {
  DefaultStages.registerAll()

  private def writeSpec(dir: java.nio.file.Path, yaml: String): Unit = {
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("task.yml"), yaml)
  }

  private def miniSpec(where: String) =
    s"""runnable: true
       |pipeline: [scan-region, count-region]
       |config:
       |  scan-region:
       |    path: $sfDir
       |  count-region:
       |    sql: "SELECT count(*) AS n FROM region WHERE $where"
       |input_ids: [1]
       |""".stripMargin

  private def register(): Unit = {
    import graft.operators.SqlStage
    StageRegistry.register("count-region",
      () => new SqlStage("count-region", Set("region"), "region_count",
        "SELECT count(*) AS n FROM region"))
  }

  test("load discovers nested task trees with parent links") {
    register()
    val root = tempDir("batch")
    writeSpec(root.resolve("a"), miniSpec("true"))
    writeSpec(root.resolve("a/b"), "config: {}\n")
    writeSpec(root.resolve("c"), "runnable: false\n")
    val batch = new Batch(spark)
    batch.load(root)
    assert(batch.tasks.size == 3)
    assert(batch.task(root.resolve("a/b")).get.parent
      == batch.task(root.resolve("a")))
    // contexts: only runnable tasks (a and its child b inherit runnable)
    assert(batch.contexts.map(_.task.path.getName).toSet == Set("a", "b"))
  }

  test("run executes pending tasks, transitions to not-pending") {
    register()
    val root = tempDir("batch")
    writeSpec(root.resolve("t1"), miniSpec("r_regionkey < 3"))
    val batch = new Batch(spark)
    batch.load(root)
    assert(batch.pendingContexts.size == 1)
    val status = Status.create(root.resolve("status.jsonl"))
    assert(batch.run(status = Some(status)))
    assert(batch.pendingContexts.isEmpty)
    val events = Status.readEvents(root.resolve("status.jsonl"))
    val infos = events.map(_.getOrElse("info", "")).toList
    assert(infos.contains("batch") && infos.contains("completed"))
    assert(Status.render(events).nonEmpty)
  }

  test("run writes per-task execution metrics with real input volume") {
    val root = tempDir("metrics")
    val dir = root.resolve("m")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("task.yml"),
      s"""runnable: true
         |pipeline: [scan-lineitem, filter-shipdate, pricing-summary, sort-summary, sink-parquet]
         |config:
         |  scan-lineitem: {path: $sfDir}
         |  filter-shipdate: {where: "l_shipdate <= '1998-09-02'"}
         |  sort-summary: {by: [l_returnflag]}
         |input_ids: [1]
         |scopes: {result: '${root}/out/%s.parquet'}
         |""".stripMargin)
    val batch = new Batch(spark)
    batch.load(root)
    assert(batch.run())
    val metrics = Json.parseJson(
      Files.readString(dir.resolve("metrics.json")))
    assert(metrics("jobs").asInstanceOf[Long] > 0)
    assert(metrics("tasks").asInstanceOf[Long] > 0)
    assert(metrics("input_records").asInstanceOf[Long] >= 6000) // lineitem rows
    assert(metrics("shuffle_write_bytes").asInstanceOf[Long] > 0) // the sort
    // observed output rows for every stored field ride the write job
    // (no recount): the persisted summary must report its real row count
    val rowsOut = metrics("rows_out").asInstanceOf[Map[String, Any]]
      .map { case (k, v) => k -> v.asInstanceOf[Long] }
    assert(rowsOut.nonEmpty, metrics.toString)
    assert(rowsOut.keys.forall(_.startsWith("1/")), rowsOut.toString)
    assert(rowsOut.values.forall(_ > 0), rowsOut.toString)
    assert(rowsOut.values.max <= 6000L, rowsOut.toString)
    // reset clears the metrics file along with the other artifacts
    batch.task(dir).get.reset()
    assert(!Files.exists(dir.resolve("metrics.json")))
  }

  test("run aborts on first failure and reports the failing stage") {
    register()
    StageRegistry.register("fail-stage", () => new Stage {
      override def id = "fail-stage"
      override def outputs = Set("never")
      def process(ctx: StageContext, in: Map[String, org.apache.spark.sql.DataFrame],
                  cfg: Config) = throw new RuntimeException("boom")
    })
    val root = tempDir("batch")
    writeSpec(root.resolve("a_fails"),
      """runnable: true
        |pipeline: [fail-stage]
        |input_ids: [1]
        |""".stripMargin)
    writeSpec(root.resolve("b_never_runs"), miniSpec("true"))
    val batch = new Batch(spark)
    batch.load(root)
    val status = Status.create(root.resolve("status.jsonl"))
    assert(!batch.run(status = Some(status)))
    val events = Status.readEvents(root.resolve("status.jsonl"))
    val err = events.find(_.get("info").contains("error")).get
    assert(err("stage") == "fail-stage")
    assert(String.valueOf(err("traceback")).contains("boom"))
    // b_never_runs is still pending (abort-on-failure)
    assert(batch.pendingContexts.exists(
      _.task.path.getName == "b_never_runs"))
  }
}
