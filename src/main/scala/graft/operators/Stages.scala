package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core._

/** Built-in operator stages — the engine's counterpart of the hand-written
  * `Stage.process` bodies of reference users (repype/stage.py:324-351;
  * SURVEY.md §2.b). Each is a thin declarative wrapper over
  * `org.apache.spark.sql` so Catalyst owns pushdown/pruning/join selection;
  * stages only wire fields (named DataFrames) together.
  *
  * All stages are config-driven (per-stage namespaces,
  * repype/pipeline.py:229): hyperparameters come from the stage's Config
  * section at run time, so a task.yml fully defines a pipeline.
  */

/** Scan a testdata table into a pipeline field of the same name.
  * Config: `path` (dir with `<table>.parquet`, required). */
final class ScanTableStage(table: String) extends Stage {
  override def id: String = s"scan-$table"
  override def outputs: Set[String] = Set(table)
  override def version: Int = 1
  def process(ctx: StageContext, in: Map[String, DataFrame],
              config: Config): Map[String, DataFrame] = {
    val path = config.get("path", null) match {
      case s: String => s"$s/$table.parquet"
      case _ => throw new IllegalArgumentException(s"$id: config 'path' required")
    }
    Map(table -> ctx.spark.read.parquet(path))
  }
}

/** Filter a field by a SQL predicate. Config: `where` (required). */
final class FilterStage(val field: String, name: String,
                        output: Option[String] = None) extends Stage {
  override def id: String = name
  override def inputs: Set[String] = Set(field)
  override def outputs: Set[String] = Set(output.getOrElse(field + "_filtered"))
  override def version: Int = 1
  def process(ctx: StageContext, in: Map[String, DataFrame],
              config: Config): Map[String, DataFrame] = {
    val where = config.get("where", null) match {
      case s: String => s
      case _ => throw new IllegalArgumentException(s"$id: config 'where' required")
    }
    Map(outputs.head -> in(field).filter(expr(where)))
  }
}

/** Arbitrary SQL over the declared input fields (registered as temp views
  * named like the fields). Config: `sql` (defaults to `defaultSql`). */
final class SqlStage(name: String, override val inputs: Set[String],
                     output: String, defaultSql: String) extends Stage {
  override def id: String = name
  override def outputs: Set[String] = Set(output)
  override def version: Int = 1
  def process(ctx: StageContext, in: Map[String, DataFrame],
              config: Config): Map[String, DataFrame] = {
    in.foreach { case (f, df) => df.createOrReplaceTempView(f) }
    val sql = config.get("sql", defaultSql) match {
      case s: String => s
      case _ if defaultSql != null => defaultSql
      case _ => throw new IllegalArgumentException(s"$id: config 'sql' required")
    }
    Map(output -> ctx.spark.sql(sql))
  }
}

/** Project/rename/drop. Config: `select` = list of SQL column exprs. */
final class SelectStage(name: String, val field: String, output: String)
  extends Stage {
  override def id: String = name
  override def inputs: Set[String] = Set(field)
  override def outputs: Set[String] = Set(output)
  override def version: Int = 1
  def process(ctx: StageContext, in: Map[String, DataFrame],
              config: Config): Map[String, DataFrame] = {
    val cols = config.get("select", null) match {
      case l: Seq[_] => l.map(c => expr(String.valueOf(c)))
      case _ => throw new IllegalArgumentException(s"$id: config 'select' required")
    }
    Map(output -> in(field).select(cols: _*))
  }
}

/** Global sort. Config: `by` = list of "col [desc]" strings. */
final class SortStage(name: String, val field: String, output: String)
  extends Stage {
  override def id: String = name
  override def inputs: Set[String] = Set(field)
  override def outputs: Set[String] = Set(output)
  override def version: Int = 1
  def process(ctx: StageContext, in: Map[String, DataFrame],
              config: Config): Map[String, DataFrame] = {
    val by = config.get("by", null) match {
      case l: Seq[_] => l.map { c =>
        String.valueOf(c).split("\\s+") match {
          case Array(name, d) if d.equalsIgnoreCase("desc") => col(name).desc
          case Array(name) => col(name).asc
          case other => col(other.mkString(" ")).asc
        }
      }
      case _ => throw new IllegalArgumentException(s"$id: config 'by' required")
    }
    Map(output -> in(field).orderBy(by: _*))
  }
}

/** Write a field to Parquet at the scope-resolved path (scope `result`,
  * `%s` → input id; repype/pipeline.py:364-374) or config `path`.
  * Consumes nothing; outputs a tiny receipt field naming the sink path so
  * downstream stages (and the store) can depend on the sink having run —
  * deliberately NOT a re-read/count of the output (that would double the
  * sink's I/O at any scale). */
final class SinkParquetStage(name: String, val field: String) extends Stage {
  override def id: String = name
  override def inputs: Set[String] = Set(field)
  override def outputs: Set[String] = Set(field + "_sunk")
  override def version: Int = 3
  def process(ctx: StageContext, in: Map[String, DataFrame],
              config: Config): Map[String, DataFrame] = {
    // target resolution order: explicit config `path` (raw, %s = input id)
    // → config `scope` naming a task scope (placeholder-expanded by the
    // task, so {ROOTDIR} etc. work) → the default `result` scope
    val scopeName = config.get("scope", "result") match {
      case s: String => s
      case _ => "result"
    }
    val target = config.get("path", null) match {
      case s: String => s.replace("%s", ctx.inputId.render)
      case _ => ctx.pipeline.resolve(scopeName, ctx.inputId) match {
        case Some(p) => p.toString
        case None => throw new IllegalArgumentException(
          s"$id: no '$scopeName' scope and no config 'path'")
      }
    }
    in(field).write.mode("overwrite").parquet(target)
    import ctx.spark.implicits._
    Map(field + "_sunk" -> Seq(target).toDF("path"))
  }
}

/** Bridge: any named query from the engine's analytic surface
  * (`SparkEntry.queries`) as a pipeline stage — spec name `query-<name>`,
  * output field `<name>`. Config: `path` (testdata dir, required). This is
  * what makes SURVEY §2.b literal: every declared operator is runnable
  * from a task.yml pipeline, sinkable, picked up incrementally, and
  * benchmarked like any hand-written stage. */
final class QueryStage(queryName: String) extends Stage {
  override def id: String = s"query-$queryName"
  override def outputs: Set[String] = Set(queryName)
  override def version: Int = 1
  def process(ctx: StageContext, in: Map[String, DataFrame],
              config: Config): Map[String, DataFrame] = {
    val dir = config.get("path", null) match {
      case s: String => s
      case _ => throw new IllegalArgumentException(s"$id: config 'path' required")
    }
    val query = graft.SparkEntry.queries.getOrElse(queryName,
      throw new IllegalArgumentException(s"$id: unknown query $queryName"))
    Map(queryName -> query(ctx.spark, dir))
  }
}

/** Default registry wiring for the task.yml surface (replaces the
  * reference's dotted-import pipeline lists, repype/task.py:344-369). */
object DefaultStages {
  @volatile private var done = false
  def registerAll(): Unit = synchronized {
    if (done) return
    done = true
    // parametric families: the full query surface + arbitrary-field sinks
    StageRegistry.registerPrefix("query-",
      name => new QueryStage(name.stripPrefix("query-")))
    StageRegistry.registerPrefix("sink-parquet:",
      name => new SinkParquetStage(name, name.stripPrefix("sink-parquet:")))
    // generic SQL compose: spec `sql:<output>:<in1>+<in2>+…` consumes the
    // named prior fields as temp views and emits `<output>` from config
    // `sql` — the task.yml primitive for joining stage outputs (e.g. the
    // selection signals of the data_selection example into one filtered
    // corpus) without writing a Scala stage. Inputs ride in the spec name
    // because toposort needs them before any config is resolved.
    StageRegistry.registerPrefix("sql:", name => {
      val parts = name.stripPrefix("sql:").split(":", 2)
      require(parts.length == 2 && parts(0).nonEmpty && parts(1).nonEmpty,
        s"$name: expected sql:<output>:<in1>+<in2>+...")
      val ins = parts(1).split("\\+").toSet
      // an empty segment ('a++b', '+a') would otherwise surface later as
      // an opaque toposort failure instead of failing at creation
      require(ins.forall(_.nonEmpty),
        s"$name: empty input field in '${parts(1)}'")
      new SqlStage(name, ins, parts(0), null)
    })
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings"))
      StageRegistry.register(s"scan-$t", () => new ScanTableStage(t))
    StageRegistry.register("filter-shipdate",
      () => new FilterStage("lineitem", "filter-shipdate"))
    StageRegistry.register("pricing-summary",
      () => new SqlStage("pricing-summary", Set("lineitem_filtered"),
        "summary",
        """SELECT l_returnflag, l_linestatus,
          |  round(sum(l_quantity), 2)      AS sum_qty,
          |  round(sum(l_extendedprice), 2) AS sum_base_price,
          |  round(avg(l_discount), 4)      AS avg_disc,
          |  count(*)                       AS count_order
          |FROM lineitem_filtered
          |GROUP BY l_returnflag, l_linestatus""".stripMargin))
    StageRegistry.register("sort-summary",
      () => new SortStage("sort-summary", "summary", "summary_sorted"))
    StageRegistry.register("sink-parquet",
      () => new SinkParquetStage("sink-parquet", "summary_sorted"))
  }
}
