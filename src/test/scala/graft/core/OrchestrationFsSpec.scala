package graft.core

import org.apache.hadoop.fs.{Path => HPath}

import graft.SparkSpec
import graft.operators.DefaultStages

/** The orchestration tier (Task digests/store/load, Batch discovery,
  * Benchmark CSV, Status JSONL, metrics.json) runs through the Hadoop
  * FileSystem API ([[SidecarFs]]), so a task TREE lives wherever its data
  * lives. These specs drive the complete lifecycle — run → pickup no-op →
  * diverging-suffix re-run → reset — under SCHEME-QUALIFIED `file:` URIs
  * (paths the old `java.nio.file` implementation could not parse: a
  * Files.exists("file:/…") is silently false, so every digest read said
  * "incomplete" and pickup semantics were local-POSIX-only), plus a
  * `mockfs://` run proving the whole tier dispatches by URI scheme — the
  * [[graft.llm.SidecarFsSpec]] discipline extended from the index
  * lifecycle to the task lifecycle. Reference semantics under test:
  * repype/task.py:371-402 (pending), 536-627 (diverging/pickup). */
class OrchestrationFsSpec extends SparkSpec {
  DefaultStages.registerAll()

  private def writeSpec(dir: String, yaml: String): Unit = {
    SidecarFs.mkdirs(dir)
    SidecarFs.writeStringAtomic(s"$dir/task.yml", yaml)
  }

  private def q1Spec(root: String, maxDate: String) =
    s"""runnable: true
       |pipeline:
       |  - scan-lineitem
       |  - filter-shipdate
       |  - pricing-summary
       |  - sort-summary
       |  - sink-parquet
       |config:
       |  scan-lineitem:
       |    path: $sfDir
       |  filter-shipdate:
       |    where: "l_shipdate <= '$maxDate'"
       |  sort-summary:
       |    by: [l_returnflag, l_linestatus]
       |input_ids: [1]
       |scopes:
       |  result: '$root/out/%s.parquet'
       |""".stripMargin

  test("task lifecycle under scheme-qualified file: URIs — run, pickup " +
      "no-op, diverging-suffix re-run with time reuse, reset") {
    val root = "file:" + tempDir("graft-ofs-")
    writeSpec(s"$root/t", q1Spec(root, "1998-09-02"))
    writeSpec(s"$root/t/variant",
      """config:
        |  filter-shipdate:
        |    where: "l_shipdate <= '1997-06-01'"
        |""".stripMargin)
    val batch = new Batch(spark)
    batch.load(new HPath(root))
    val task = batch.task(s"$root/t").get
    // discovery preserved the caller's scheme spelling
    assert(task.path.toString == s"$root/t")
    val ctx = RunContext(task, task.createPipeline(), task.createConfig())

    // 1. run from scratch; every artifact lands on the scheme path
    assert(ctx.pending == "incomplete")
    val data = ctx.run()
    assert(data.contains(InputId(1)))
    assert(SidecarFs.exists(s"$root/t/.sha.json"))
    assert(SidecarFs.exists(s"$root/t/.task.json"))
    assert(SidecarFs.exists(s"$root/t/times.csv"))
    // the field store is manifest-versioned; resolve like load() does
    assert(SidecarFs.exists(
      task.fieldDir("summary_sorted", InputId(1)).toString))
    assert(task.fieldDataDir("summary_sorted").toString
      .startsWith(s"$root/t/data/")) // versions live ON the scheme path
    assert(SidecarFs.exists(s"$root/out/1.parquet")) // scope sink
    assert(task.times.shape == (5, 1))

    // 2. second evaluation: pickup finds nothing to do
    assert(ctx.pending == "")
    val (p0, d0) = task.findPickupTask(ctx.pipeline, ctx.config)
    assert(p0.contains(task) && d0.isEmpty)

    // 3. the variant diverges at filter-shipdate: picks up the parent's
    //    scan prefix, re-runs the suffix, REUSES the picked-up time
    val variant = batch.task(s"$root/t/variant").get
    val vCtx = RunContext(variant, variant.createPipeline(),
      variant.createConfig())
    val (vp, vd) = variant.findPickupTask(vCtx.pipeline, vCtx.config)
    assert(vp.contains(task))
    assert(vd.map(_.id).contains("filter-shipdate"))
    vCtx.run()
    assert(vCtx.pending == "")
    assert(variant.times.get("scan-lineitem", InputId(1))
      == task.times.get("scan-lineitem", InputId(1)))
    assert(variant.times.get("filter-shipdate", InputId(1))
      != task.times.get("filter-shipdate", InputId(1)))

    // 4. both results readable BY the scheme path, and they differ
    val parentRows = spark.read
      .parquet(task.fieldDir("summary_sorted", InputId(1)).toString)
      .selectExpr("sum(count_order)").head.getLong(0)
    val childRows = spark.read
      .parquet(variant.fieldDir("summary_sorted", InputId(1)).toString)
      .selectExpr("sum(count_order)").head.getLong(0)
    assert(childRows < parentRows)

    // 5. reset clears the scheme-path artifacts
    task.reset()
    assert(ctx.pending == "incomplete")
    assert(!SidecarFs.exists(s"$root/t/.sha.json"))
    assert(!SidecarFs.exists(s"$root/t/data"))
  }

  test("Batch.run under a file: scheme root writes status.jsonl, " +
      "metrics.json, and times.csv through the FileSystem layer") {
    val root = "file:" + tempDir("graft-ofs-b-")
    writeSpec(s"$root/m", q1Spec(root, "1998-09-02"))
    val batch = new Batch(spark)
    batch.load(new HPath(root))
    val statusPath = new HPath(s"$root/status.jsonl")
    val status = Status.create(statusPath)
    try assert(batch.run(status = Some(status)))
    finally status.close()
    // status events carry the scheme-qualified task path and render
    val events = Status.readEvents(statusPath)
    val infos = events.map(_.getOrElse("info", "")).toList
    assert(infos.contains("batch") && infos.contains("completed"))
    assert(events.exists(_.get("task").contains(s"$root/m")))
    assert(Status.render(events).contains(s"Entering task: $root/m"))
    // metrics.json landed next to the digests on the scheme path
    val metrics = Json.parseJson(
      SidecarFs.readString(s"$root/m/metrics.json").get)
    assert(metrics("jobs").asInstanceOf[Long] > 0)
    // Benchmark CSV round-trips through the same layer
    val times = Benchmark.load(new HPath(s"$root/m/times.csv"))
    assert(times.shape == (5, 1))
    assert(batch.pendingContexts.isEmpty)
  }

  test("full task lifecycle under a NON-file scheme (mockfs://): " +
      "discovery, digests, pickup, store/load, reset all dispatch by " +
      "URI scheme") {
    val hc = SparkSpec.spark.sparkContext.hadoopConfiguration
    hc.set("fs.mockfs.impl", classOf[graft.llm.MockSchemeFs].getName)
    try {
      val root = "mockfs://" + tempDir("graft-ofs-mock-")
      writeSpec(s"$root/t", q1Spec(root, "1998-09-02"))
      writeSpec(s"$root/t/variant",
        """config:
          |  filter-shipdate:
          |    where: "l_shipdate <= '1997-06-01'"
          |""".stripMargin)
      val batch = new Batch(spark)
      batch.load(new HPath(root))
      assert(batch.tasks.size == 2)
      val task = batch.task(s"$root/t").get
      val ctx = RunContext(task, task.createPipeline(), task.createConfig())
      assert(ctx.pending == "incomplete")
      ctx.run()
      assert(ctx.pending == "")
      assert(SidecarFs.exists(s"${task.path}/.sha.json"))
      // the variant picks up the mockfs parent and re-runs its suffix
      val variant = batch.task(s"$root/t/variant").get
      val vCtx = RunContext(variant, variant.createPipeline(),
        variant.createConfig())
      val (vp, vd) = variant.findPickupTask(vCtx.pipeline, vCtx.config)
      assert(vp.exists(_.path.toString == task.path.toString))
      assert(vd.map(_.id).contains("filter-shipdate"))
      vCtx.run()
      assert(vCtx.pending == "")
      // load() reads the field store back through the scheme
      val loaded = task.load(Some(ctx.pipeline))
      assert(loaded(InputId(1))("summary_sorted").count() > 0)
      task.reset()
      assert(ctx.pending == "incomplete")
    } finally hc.unset("fs.mockfs.impl")
  }
}
