package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Input identifier: Long or String (repype/typing.py:20-23). Ordering is
  * numeric for Longs, lexicographic for Strings, Longs before Strings —
  * matching Python's sort over homogeneous lists (mixed lists are rare and
  * need *some* total order, which Python does not even provide). */
sealed trait InputId extends Ordered[InputId] {
  def compare(that: InputId): Int = (this, that) match {
    case (InputId.Num(a), InputId.Num(b)) => a.compare(b)
    case (InputId.Str(a), InputId.Str(b)) => a.compare(b)
    case (InputId.Num(_), InputId.Str(_)) => -1
    case (InputId.Str(_), InputId.Num(_)) => 1
  }
  def render: String = this match {
    case InputId.Num(v) => v.toString
    case InputId.Str(v) => v
  }
}

object InputId {
  final case class Num(value: Long) extends InputId
  final case class Str(value: String) extends InputId

  def apply(v: Any): InputId = v match {
    case i: Int => Num(i.toLong)
    case l: Long => Num(l)
    case s: String if s.matches("^[0-9]+$") => Num(s.toLong)
    case s: String => Str(s)
    case other => Str(String.valueOf(other))
  }

  /** Parse `"1-5, 8, a"` → sorted de-duplicated ids
    * (repype/task.py:47-95): integer tokens, integer ranges `a-b` (a<b),
    * anything else a string id; invalid ranges raise. */
  def decode(spec: Any): List[InputId] = spec match {
    case s: String =>
      val ids = s.replace(" ", "").split(",").filter(_.nonEmpty).flatMap { token =>
        val range = "^([0-9]+)?-([0-9]+)?$".r
        token match {
          case t if t.matches("^[0-9]+$") => Seq(Num(t.toLong))
          case range(a, b) =>
            if (a != null && b != null && a.toLong < b.toLong)
              (a.toLong to b.toLong).map(Num.apply)
            else throw new IllegalArgumentException(
              s"""Cannot parse input token "$token"""")
          case t => Seq(Str(t))
        }
      }
      ids.toList.distinct.sorted
    case l: Seq[_] => l.map(InputId.apply).toList.distinct.sorted
    case null => Nil
    case single => List(InputId(single))
  }
}

/** Execution context handed to a stage. */
final case class StageContext(
    spark: SparkSession,
    pipeline: Pipeline,
    inputId: InputId,
    status: Option[Status] = None)

/** Start/stop window over the stage sequence (repype/pipeline.py:24-77). */
final class ProcessingControl(firstStage: Option[String], lastStage: Option[String]) {
  var started: Boolean = firstStage.isEmpty
  def step(stageId: String): Boolean = {
    if (!started && firstStage.contains(stageId)) started = true
    val doStep = started
    if (lastStage.contains(stageId)) started = false
    doStep
  }
}

/** Thrown when a stage fails; carries the failing stage id
  * (repype/pipeline.py:116-131). */
final class StageError(val stageId: String, cause: Throwable)
  extends RuntimeException(s"""The stage "$stageId" failed""", cause)

/** Ordered stage sequence + output path scopes.
  *
  * Counterpart of repype/pipeline.py:133-467: successive stage execution
  * with `firstStage`/`lastStage` windows (incl. the `"stage+"` = "after
  * stage" suffix), dependency-closure (`extraStages`), per-input
  * hyperparameter adoption (`configure`), scope path templating (`resolve`),
  * and the field universe (`fields`/`persistentFields`). Construction via
  * [[Pipeline.create]] toposorts stages from their declared field deps.
  */
final class Pipeline(
    val spark: SparkSession,
    initialStages: Seq[Stage] = Seq.empty,
    val scopes: Map[String, String] = Map.empty) {

  private var stageVec: Vector[Stage] = Vector.empty
  initialStages.foreach(s => append(s))

  def stages: Vector[Stage] = stageVec

  /** Position of `stageId`, or -1 (repype/pipeline.py:295-303). */
  def find(stageId: String): Int = stageVec.indexWhere(_.id == stageId)

  def stage(stageId: String): Option[Stage] = stageVec.find(_.id == stageId)

  /** Append, or insert after the stage with the given id/index; rejects
    * duplicate ids (repype/pipeline.py:314-336). */
  def append(stage: Stage, after: Option[Either[String, Int]] = None): Int = {
    require(!stageVec.exists(_.id == stage.id),
      s"""Stage with ID "${stage.id}" already added""")
    after match {
      case None =>
        stageVec = stageVec :+ stage
        stageVec.length - 1
      case Some(a) =>
        val idx = a.fold(find, identity)
        require(idx >= -1 && idx < stageVec.length, s"invalid insert position $idx")
        val (l, r) = stageVec.splitAt(idx + 1)
        stageVec = (l :+ stage) ++ r
        idx + 1
    }
  }

  /** Run the stage window for one input (repype/pipeline.py:164-254).
    *
    * `firstStage` may end in `"+"` meaning "after that stage"; it is also
    * expanded backwards by [[extraStages]] when `data` lacks inputs the
    * window needs. Returns (data, final config, per-stage seconds).
    */
  def process(
      inputId: InputId,
      config: Config,
      firstStage: Option[String] = None,
      lastStage: Option[String] = None,
      data: Map[String, DataFrame] = Map.empty,
      status: Option[Status] = None): (Map[String, DataFrame], Config, Map[String, Double]) = {

    val first = firstStage.map { f =>
      if (f.endsWith("+")) {
        val idx = find(f.dropRight(1))
        require(idx >= 0, s"stage not found: ${f.dropRight(1)}")
        if (idx + 1 < stageVec.length) stageVec(idx + 1).id else return (data, config, Map.empty)
      } else f
    }

    val extra = first.map(f => extraStages(Some(f), lastStage, data.keySet)).getOrElse(Nil)
    val ctrl = new ProcessingControl(first, lastStage)
    var d = data + ("input_id" -> inputIdFrame(inputId))
    var times = Map.empty[String, Double]
    val ctx = StageContext(spark, this, inputId, status)
    for (st <- stageVec) {
      if (ctrl.step(st.id) || extra.contains(st.id)) {
        // stage-level events ("start-stage"/"skip-stage") are emitted by
        // Stage.run itself, mirroring repype/stage.py:235-240
        try {
          val (nd, dt) = st.run(ctx, d, config)
          d = nd
          times += (st.id -> dt)
        } catch {
          case e: Throwable => throw new StageError(st.id, e)
        }
      }
    }
    (d, config, times)
  }

  /** The `input_id` pipeline field as a 1-row DataFrame — the relational
    * rendering of repype's implicit `input_id` key
    * (repype/pipeline.py:376-384). */
  private def inputIdFrame(inputId: InputId): DataFrame = {
    import spark.implicits._
    Seq(inputId.render).toDF("input_id")
  }

  /** Upstream stages that must also run to supply missing inputs for the
    * window (repype/pipeline.py:256-293). */
  def extraStages(firstStage: Option[String], lastStage: Option[String],
                  availableInputs: Set[String]): List[String] = {
    var required = Set.empty[String]
    var available = availableInputs + "input_id"
    var stageByOutput = Map.empty[String, Stage]
    val ctrl = new ProcessingControl(firstStage, lastStage)
    for (st <- stageVec) {
      stageByOutput ++= st.outputs.map(_ -> st)
      if (ctrl.step(st.id)) {
        required ++= st.inputs
        available ++= st.outputs
      }
    }
    var extras = List.empty[String]
    var missing = required.diff(available)
    while (missing.nonEmpty) {
      val st = stageByOutput(missing.head)
      required ++= st.inputs
      available ++= st.outputs
      extras :+= st.id
      missing = required.diff(available)
    }
    extras
  }

  /** Per-input hyperparameter adoption (repype/pipeline.py:80-113,338-362):
    * for each stage rule, `<stage>/<key>` defaults to
    * `factor × <stage>/AF_<key>` then is cast/clamped. */
  def configure(baseConfig: Config, inputId: InputId): Config =
    stageVec.foldLeft(baseConfig) { (cfg, st) =>
      st.configure(this, inputId).foldLeft(cfg) { (c, rule) =>
        val key = s"${st.id}/${rule.key}"
        val parts = key.split("/")
        val afKey = (parts.init :+ s"AF_${parts.last}").mkString("/")
        val af = c.get(afKey, rule.defaultUserFactor) match {
          case n: Long => n.toDouble
          case d: Double => d
          case _ => rule.defaultUserFactor
        }
        var c2 = c.setDefault(key, rule.factor * af, overrideNone = true)
        def num(v: Any): Double = v match {
          case n: Long => n.toDouble
          case d: Double => d
          case other => other.toString.toDouble
        }
        rule.min.foreach(m => c2 = c2.updatedWith(key, v => math.max(num(v), m)))
        rule.max.foreach(m => c2 = c2.updatedWith(key, v => math.min(num(v), m)))
        if (rule.integer) c2 = c2.updatedWith(key, v => num(v).toLong)
        c2
      }
    }

  /** `scopes(scope) % input_id` → absolute path (repype/pipeline.py:364-374).
    * Hadoop Path, so scopes may live on any Hadoop filesystem; scheme-less
    * relative templates resolve against the working directory exactly as
    * the java.nio implementation did. */
  def resolve(scope: String, inputId: InputId): Option[org.apache.hadoop.fs.Path] =
    scopes.get(scope).map(template =>
      SidecarFs.canon(template.replace("%s", inputId.render)
        .replace("%d", inputId.render)))

  /** All fields the pipeline produces (repype/pipeline.py:376-384). */
  def fields: Set[String] = stageVec.flatMap(_.outputs).toSet + "input_id"

  /** Produced minus consumed fields (repype/pipeline.py:386-394). */
  def persistentFields: Set[String] =
    fields -- stageVec.flatMap(_.consumes)
}

object Pipeline {

  /** Toposort stages from declared field dependencies
    * (repype/pipeline.py:409-467): a stage is schedulable when its inputs
    * are available and its consumed fields are not a subset of any other
    * remaining stage's inputs; rejects ambiguous ids/outputs and
    * unsatisfiable orders.
    */
  def create(spark: SparkSession, stages: Seq[Stage],
             scopes: Map[String, String] = Map.empty): Pipeline = {
    val ids = stages.map(_.id)
    require(ids.distinct.length == ids.length, "ambiguous stage identifiers")
    val outputs = "input_id" +: stages.flatMap(_.outputs.toList)
    require(outputs.distinct.length == outputs.length, "ambiguous outputs")

    var available = Set("input_id")
    var remaining = stages.toList
    val pipeline = new Pipeline(spark, Seq.empty, scopes)
    while (remaining.nonEmpty) {
      val next = remaining.find { s1 =>
        s1.inputs.subsetOf(available) &&
          !remaining.exists(s2 => (s2 ne s1) &&
            s1.consumes.nonEmpty && s1.consumes.subsetOf(s2.inputs))
      }.getOrElse(throw new RuntimeException(
        s"Failed to resolve total ordering (pipeline so far: " +
          s"${pipeline.stages.map(_.id)}, available input fields: $available, " +
          s"remaining stages: ${remaining.map(_.id)})"))
      remaining = remaining.filterNot(_ eq next)
      pipeline.append(next)
      available ++= next.outputs
      available --= next.consumes
    }
    pipeline
  }
}
