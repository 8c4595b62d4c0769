package graft

import java.nio.file.Paths

import org.apache.spark.sql.SparkSession

import graft.core.{Batch, Status}
import graft.operators.DefaultStages

/** CLI batch runner — counterpart of `python -m repype <root> --run`
  * (repype/cli.py:248-399): dry-run by default (lists pending tasks),
  * `--run` executes, `--reset` clears task artifacts, repeatable `--task`
  * selects specific task paths. Status events stream to
  * `<root>/status.jsonl` and render to stdout.
  */
object GraftCli {
  def main(args: Array[String]): Unit = {
    var path: Option[String] = None
    var run = false
    var reset = false
    var tasks = List.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--run" => run = true
        case "--reset" => reset = true
        case "--task" => tasks :+= args(i + 1); i += 1
        case p if path.isEmpty => path = Some(p)
        case other => throw new IllegalArgumentException(s"unexpected arg: $other")
      }
      i += 1
    }
    require(path.isDefined, "usage: GraftCli <root> [--run|--reset] [--task <path>]...")
    require(!(run && reset), "--run and --reset are mutually exclusive")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    DefaultStages.registerAll()

    val root = Paths.get(path.get)
    val batch = new Batch(spark)
    batch.load(root)
    def select(cs: List[graft.core.RunContext]) =
      if (tasks.isEmpty) cs
      else cs.filter(c =>
        tasks.exists(t => c.task.path.endsWith(Paths.get(t).getFileName.toString)
          || c.task.path == Paths.get(t).toAbsolutePath.normalize()))
    // reset applies to all selected runnable tasks (a completed task is
    // exactly what reset is for); run/dry-run only to pending ones
    val selected = select(if (reset) batch.contexts else batch.pendingContexts)

    if (reset) {
      selected.foreach { c => println(s"resetting ${c.task.path}"); c.task.reset() }
    } else if (!run) {
      println(s"DRY RUN — ${selected.size} pending task(s):")
      selected.foreach(c => println(s"  ${c.task.path} (${c.pending})"))
    } else {
      val statusPath = root.resolve("status.jsonl")
      val status = Status.create(statusPath)
      val ok = batch.run(Some(selected), Some(status))
      println(Status.render(Status.readEvents(statusPath)))
      if (!ok) { spark.stop(); sys.exit(1) }
    }
    spark.stop()
  }
}
