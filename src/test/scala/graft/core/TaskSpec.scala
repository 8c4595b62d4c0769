package graft.core

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.DefaultStages

/** Mirrors tests/test_task.py: spec merge, config precedence, input ids,
  * path resolution, digests/pending, diverging stage + pickup, store/load
  * round-trip, reset. */
class TaskSpec extends SparkSpec {
  DefaultStages.registerAll()

  private def writeSpec(dir: java.nio.file.Path, yaml: String): Unit = {
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("task.yml"), yaml)
  }

  private def q1Spec(dir: String, maxDate: String) =
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
       |""".stripMargin

  test("fullSpec deep-merges parent chain; child overrides") {
    val root = tempDir("task")
    val parentDir = root.resolve("t")
    val childDir = parentDir.resolve("variant")
    writeSpec(parentDir, q1Spec(sfDir, "1998-09-02"))
    writeSpec(childDir,
      """config:
        |  filter-shipdate:
        |    where: "l_shipdate <= '1998-12-01'"
        |""".stripMargin)
    val batch = new Batch(spark)
    batch.load(root)
    val parent = batch.task(parentDir).get
    val child = batch.task(childDir).get
    assert(child.parent.contains(parent))
    assert(child.runnable) // inherited
    assert(child.fullSpec("pipeline") == parent.fullSpec("pipeline"))
    assert(child.createConfig().get("filter-shipdate/where", "")
      .toString.contains("1998-12-01"))
    assert(parent.createConfig().get("filter-shipdate/where", "")
      .toString.contains("1998-09-02"))
  }

  test("createConfig precedence: parent < base_config_path < own config") {
    val root = tempDir("task")
    val pDir = root.resolve("p")
    val cDir = pDir.resolve("c")
    Files.createDirectories(cDir)
    // {ROOTDIR} = the root *task* dir (p), not the filesystem parent
    Files.writeString(pDir.resolve("base.yml"),
      "s1:\n  a: base\n  b: base\n  c: base\n")
    writeSpec(pDir,
      """runnable: true
        |config:
        |  s1:
        |    a: parent
        |    b: parent
        |""".stripMargin)
    writeSpec(cDir,
      s"""base_config_path: '{ROOTDIR}/base.yml'
         |config:
         |  s1:
         |    a: own
         |""".stripMargin)
    val batch = new Batch(spark)
    batch.load(root)
    val cfg = batch.task(cDir).get.createConfig()
    assert(cfg.get("s1/a", "") == "own")      // own config wins
    assert(cfg.get("s1/b", "") == "base")     // base overrides parent
    assert(cfg.get("s1/c", "") == "base")
  }

  test("resolvePath placeholders") {
    val root = tempDir("task")
    val dir = root.resolve("mytask")
    writeSpec(dir, "runnable: true\n")
    val batch = new Batch(spark)
    val t = batch.task(dir).get
    assert(t.resolvePath("{DIRNAME}/x").toString.endsWith("mytask/mytask/x"))
    assert(t.resolvePath("rel").toString.startsWith(dir.toString))
    assert(t.resolvePath("/abs/p").toString == "/abs/p")
  }

  test("e2e: run, pickup no-op, child re-runs diverging suffix, reset") {
    val root = tempDir("task")
    val tDir = root.resolve("t")
    val vDir = tDir.resolve("variant")
    writeSpec(tDir, q1Spec(sfDir, "1998-09-02")
      + s"scopes:\n  result: '${root}/out/%s.parquet'\n")
    writeSpec(vDir,
      """config:
        |  filter-shipdate:
        |    where: "l_shipdate <= '1997-06-01'"
        |""".stripMargin)
    val batch = new Batch(spark)
    batch.load(root)
    val task = batch.task(tDir).get
    val ctx = RunContext(task, task.createPipeline(), task.createConfig())

    // 1. initially pending as incomplete
    assert(ctx.pending == "incomplete")
    val data = ctx.run()
    assert(data.contains(InputId(1)))
    assert(SidecarFs.exists(task.digestShaFilepath.toString))
    assert(SidecarFs.exists(
      task.fieldDir("summary_sorted", InputId(1)).toString))
    // times.csv: 5 stages × 1 input
    assert(task.times.shape == (5, 1))

    // 2. second evaluation: not pending; pickup finds nothing to do
    assert(ctx.pending == "")
    val (pickupTask, diverging) = task.findPickupTask(ctx.pipeline, ctx.config)
    assert(pickupTask.contains(task) && diverging.isEmpty)

    // 3. child diverges at filter-shipdate → picks up parent's scan prefix
    val variant = batch.task(vDir).get
    val vCtx = RunContext(variant, variant.createPipeline(), variant.createConfig())
    assert(vCtx.pending == "incomplete")
    val (vPickup, vDiverge) = variant.findPickupTask(vCtx.pipeline, vCtx.config)
    assert(vPickup.contains(task))
    assert(vDiverge.map(_.id).contains("filter-shipdate"))
    vCtx.run()
    assert(vCtx.pending == "")
    // picked-up scan keeps the parent's recorded time (golden invariant,
    // tests/test_repype.py:205-212)
    assert(variant.times.get("scan-lineitem", InputId(1))
      == task.times.get("scan-lineitem", InputId(1)))
    // re-run stage got a fresh (different) time
    assert(variant.times.get("filter-shipdate", InputId(1))
      != task.times.get("filter-shipdate", InputId(1)))

    // 4. results actually differ (different filter window)
    val parentRows = spark.read
      .parquet(task.fieldDir("summary_sorted", InputId(1)).toString)
      .selectExpr("sum(count_order)").head.getLong(0)
    val childRows = spark.read
      .parquet(variant.fieldDir("summary_sorted", InputId(1)).toString)
      .selectExpr("sum(count_order)").head.getLong(0)
    assert(childRows < parentRows)

    // 5. pipeline-change pending: replace a stage with a version-bumped one
    val bumped = ctx.pipeline.stages.map {
      case st if st.id == "pricing-summary" =>
        new Stage {
          override def id = "pricing-summary"
          override def inputs = st.inputs
          override def outputs = st.outputs
          override def version = 99
          def process(c: StageContext, in: Map[String, org.apache.spark.sql.DataFrame],
                      cfg: Config) = Map.empty
        }
      case st => st
    }
    val bumpedPipeline = Pipeline.create(spark, bumped, ctx.pipeline.scopes)
    assert(task.isPending(bumpedPipeline, ctx.config) == "pipeline")

    // 6. specification-change pending
    val cfg2 = ctx.config.updated("filter-shipdate/extra", 1L)
    assert(task.isPending(ctx.pipeline, cfg2) == "specification")

    // 7. reset clears artifacts
    task.reset()
    assert(ctx.pending == "incomplete")
    assert(!SidecarFs.exists(task.digestShaFilepath.toString))
  }

  test("multi-input task: range ids, per-input scoped sinks, times shape") {
    val root = tempDir("task")
    val dir = root.resolve("multi")
    writeSpec(dir, q1Spec(sfDir, "1998-09-02")
      .replace("input_ids: [1]", "input_ids: \"1-3\"")
      + s"scopes:\n  result: '${root}/out/%s.parquet'\n")
    val batch = new Batch(spark)
    batch.load(root)
    val t = batch.task(dir).get
    val ctx = RunContext(t, t.createPipeline(), t.createConfig())
    assert(t.inputIds == List(InputId(1), InputId(2), InputId(3)))
    val data = ctx.run()
    assert(data.keySet == Set(InputId(1), InputId(2), InputId(3)))
    for (i <- 1 to 3) {
      assert(Files.exists(root.resolve(s"out/$i.parquet")))
      assert(SidecarFs.exists(
        t.fieldDir("summary_sorted", InputId(i)).toString))
    }
    assert(t.times.shape == (5, 3))
    // homogeneous per-input configs → each field stored as ONE distributed
    // partitionBy("input_id") job: the _SUCCESS marker sits at the FIELD
    // level, not inside each input_id=N directory (SURVEY §1.4)
    val fdir = t.fieldDataDir("summary_sorted").toString
    assert(SidecarFs.exists(s"$fdir/_SUCCESS"))
    assert(!SidecarFs.exists(s"$fdir/input_id=1/_SUCCESS"))
    // and the partitioned layout round-trips through load()
    val loaded = t.load(Some(ctx.pipeline))
    assert(loaded(InputId(2))("summary_sorted").count() > 0)
  }

  test("heterogeneous per-input configs fall back to per-input writes") {
    // a stage whose configure() depends on the input id makes the
    // configure-shas diverge → store keeps the per-input loop
    StageRegistry.register("limit-by-input", () => new Stage {
      override def id = "limit-by-input"
      override def inputs = Set("lineitem")
      override def outputs = Set("limited")
      override def version = 1
      override def configure(pipeline: Pipeline, inputId: InputId) =
        Seq(ConfigureRule("limit", factor = inputId.render.toDouble * 10,
          integer = true))
      def process(ctx: StageContext, in: Map[String, org.apache.spark.sql.DataFrame],
                  config: Config) = {
        val n = config.get("limit", 10L) match {
          case l: Long => l.toInt
          case d: Double => d.toInt
          case other => other.toString.toDouble.toInt
        }
        Map("limited" -> in("lineitem").limit(n))
      }
    })
    val root = tempDir("task")
    val dir = root.resolve("het")
    writeSpec(dir,
      s"""runnable: true
         |pipeline: [scan-lineitem, limit-by-input]
         |config:
         |  scan-lineitem:
         |    path: $sfDir
         |input_ids: [1, 2]
         |""".stripMargin)
    val batch = new Batch(spark)
    batch.load(root)
    val t = batch.task(dir).get
    val ctx = RunContext(t, t.createPipeline(), t.createConfig())
    ctx.run()
    // per-input writes: _SUCCESS inside each input dir, none at field level
    val ldir = t.fieldDataDir("limited").toString
    assert(!SidecarFs.exists(s"$ldir/_SUCCESS"))
    assert(SidecarFs.exists(s"$ldir/input_id=1/_SUCCESS"))
    assert(SidecarFs.exists(s"$ldir/input_id=2/_SUCCESS"))
    // the input-dependent config actually took effect
    assert(spark.read.parquet(s"$ldir/input_id=1").count() == 10)
    assert(spark.read.parquet(s"$ldir/input_id=2").count() == 20)
  }

  test("golden console transcript for a 2-task pickup run") {
    // byte-for-byte port of the reference's marquee e2e assertion
    // (tests/test_repype.py:158-182): full console transcript of a parent
    // run from scratch + a variant picking up at its diverging stage —
    // carriage-return stage spinners, margin blank lines, clear-padding
    // and all. Divergence by design: graft's JSONL keeps every
    // intermediate, so (unlike the reference's racy file-overwrite reader)
    // this transcript is deterministic and includes "Storing results...".
    val root = tempDir("task")
    val tDir = root.resolve("t")
    val vDir = tDir.resolve("v")
    writeSpec(tDir, q1Spec(sfDir, "1998-09-02")
      + s"scopes:\n  result: '${root}/out/%s.parquet'\n")
    writeSpec(vDir,
      """config:
        |  filter-shipdate:
        |    where: "l_shipdate <= '1997-01-01'"
        |""".stripMargin)
    val batch = new Batch(spark)
    batch.load(root)
    val statusPath = root.resolve("status.jsonl")

    // live tailing: collect the transcript WHILE the batch runs
    val live = new StringBuilder
    val tailer = new StatusTailer(statusPath,
      s => live.synchronized { live.append(s) }, pollMs = 10)
    tailer.start()
    try assert(batch.run(status = Some(Status.create(statusPath))))
    finally tailer.stop()

    val pad = " " * 34 // clears "    Running stage: filter-shipdate" (34)
    val golden =
      "\n2 task(s) selected for running\n" +
      "  \n" +
      s"  (1/2) Entering task: $tDir\n" +
      "  Starting from scratch\n" +
      "    \n" +
      "    (1/1) Processing: 1\n" +
      "    Running stage: scan-lineitem\r" +
      "    Running stage: filter-shipdate\r" +
      "    Running stage: pricing-summary\r" +
      "    Running stage: sort-summary   \r" +
      "    Running stage: sink-parquet   \r" +
      pad + "\n" +
      "  Storing results...\r" +
      "  Results have been stored ✅\n" +
      "  \n" +
      s"  (2/2) Entering task: $vDir\n" +
      s"  Picking up from: $tDir (filter-shipdate)\n" +
      "    \n" +
      "    (1/1) Processing: 1\n" +
      "    Running stage: filter-shipdate\r" +
      "    Running stage: pricing-summary\r" +
      "    Running stage: sort-summary   \r" +
      "    Running stage: sink-parquet   \r" +
      pad + "\n" +
      "  Storing results...\r" +
      "  Results have been stored ✅\n"

    // post-hoc render of the event log is the golden transcript...
    assert(Status.render(Status.readEvents(statusPath)) == golden)
    // ...and the live tailer produced exactly the same bytes
    assert(live.synchronized(live.toString) == golden)
  }

  test("query-* bridge: any analytic query runs as a task.yml pipeline stage") {
    val root = tempDir("task")
    val dir = root.resolve("q")
    writeSpec(dir,
      s"""runnable: true
         |pipeline: [query-q_dedup_exact, 'sink-parquet:q_dedup_exact']
         |config:
         |  query-q_dedup_exact:
         |    path: $sfDir
         |input_ids: [1]
         |scopes: {result: '${root}/out/%s.parquet'}
         |""".stripMargin)
    val batch = new Batch(spark)
    batch.load(root)
    val t = batch.task(dir).get
    val ctx = RunContext(t, t.createPipeline(), t.createConfig())
    ctx.run()
    val sunk = spark.read.parquet(root.resolve("out/1.parquet").toString)
    assert(sunk.columns.toSeq == Seq("doc_id", "dup_cnt"))
    assert(sunk.count() == 500) // sf0.001 documents are all distinct
    // second evaluation is a pickup no-op, like any other stage
    assert(ctx.pending == "")
  }

  test("marginal stages are stripped from the store") {
    val root = tempDir("task")
    val dir = root.resolve("t")
    writeSpec(dir, q1Spec(sfDir, "1998-09-02")
      + s"marginal_stages: [pricing-summary]\nscopes:\n  result: '${root}/out/%s.parquet'\n")
    val batch = new Batch(spark)
    batch.load(root)
    val t = batch.task(dir).get
    val ctx = RunContext(t, t.createPipeline(), t.createConfig())
    assert(t.marginalFields(ctx.pipeline) == Set("summary"))
    ctx.run()
    assert(!Manifest.names(t.dataPath.toString).contains("summary"))
    assert(SidecarFs.exists(
      t.fieldDir("summary_sorted", InputId(1)).toString))
    // load validates and returns remaining fields
    val loaded = t.load(Some(ctx.pipeline))
    assert(loaded(InputId(1)).keySet == Set("summary_sorted", "lineitem",
      "lineitem_filtered", "summary_sorted_sunk"))
  }

  test("store publishes immutable field versions: a reader holding the " +
      "prior version survives a re-store, and the next publish prunes it") {
    val root = tempDir("task")
    val tDir = root.resolve("t")
    writeSpec(tDir, q1Spec(sfDir, "1998-09-02")
      + s"scopes:\n  result: '${root}/out/%s.parquet'\n")
    val batch = new Batch(spark)
    batch.load(root)
    val t = batch.task(tDir).get
    val ctx = RunContext(t, t.createPipeline(), t.createConfig())
    ctx.run() // publishes <field>_v1
    val dataRoot = t.dataPath.toString
    val v1 = Manifest.resolve(dataRoot, "summary_sorted")
    assert(v1.endsWith("summary_sorted_v1"), v1)
    val v1Rows = spark.read.parquet(s"$v1/input_id=1").count()
    assert(v1Rows > 0)
    // a second run is a pickup no-op in PROCESSING terms but re-stores:
    // v2 goes live, v1 is RETAINED (the one-cycle in-flight-reader grace)
    ctx.run()
    val v2 = Manifest.resolve(dataRoot, "summary_sorted")
    assert(v2.endsWith("summary_sorted_v2"), v2)
    assert(SidecarFs.exists(v1), "superseded version must survive one cycle")
    // the retained snapshot is still a COMPLETE readable dataset
    assert(spark.read.parquet(s"$v1/input_id=1").count() == v1Rows)
    // load() resolves to the live head
    assert(t.fieldDataDir("summary_sorted").toString == v2)
    // the third publish prunes v1, retains v2
    ctx.run()
    val v3 = Manifest.resolve(dataRoot, "summary_sorted")
    assert(v3.endsWith("summary_sorted_v3"), v3)
    assert(!SidecarFs.exists(v1), "two-generations-old version must prune")
    assert(SidecarFs.exists(v2))
    // pickup/staleness semantics are untouched by the layout
    assert(ctx.pending == "")
    val loaded = t.load(Some(ctx.pipeline))
    assert(loaded(InputId(1))("summary_sorted").count() == v1Rows)
  }

  test("sql: compose stage parses output and inputs from its spec name") {
    graft.operators.DefaultStages.registerAll()
    val s = StageRegistry.create("sql:joined:a+b+c")
    assert(s.outputs == Set("joined"))
    assert(s.inputs == Set("a", "b", "c"))
    // malformed names fail at creation, not mid-run
    assertThrows[IllegalArgumentException](StageRegistry.create("sql:noinputs"))
    assertThrows[IllegalArgumentException](StageRegistry.create("sql::a+b"))
    assertThrows[IllegalArgumentException](StageRegistry.create("sql:out:a++b"))
    assertThrows[IllegalArgumentException](StageRegistry.create("sql:out:+a"))
  }
}
