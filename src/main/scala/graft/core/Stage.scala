package graft.core

import org.apache.spark.sql.DataFrame

import scala.collection.mutable

/** A pipeline operator: declares the fields it reads (`inputs`), produces
  * (`outputs`), and removes (`consumes`); `process` is the transform.
  *
  * Faithful counterpart of the reference stage contract
  * (repype/stage.py:113-351): `run` extracts the declared inputs, times the
  * transform, validates that exactly the declared outputs were produced,
  * merges them into the pipeline data object and deletes consumed fields;
  * `enabled` hyperparameter (default [[enabledByDefault]]) elides the stage
  * with a `skip` event (repype/stage.py:234,289-322); event callbacks
  * `start`/`end`/`skip` plus the synthetic `after` = end+skip
  * (repype/stage.py:21-26,170-203).
  *
  * Identity for staleness: the JVM has no stable bytecode introspection, so
  * instead of the reference's method-bytecode digest (repype/stage.py:399-450)
  * a stage's [[signature]] is its class name + explicit [[version]] + declared
  * field sets — bump `version` when the implementation changes
  * (SURVEY.md §7.4 risk 1).
  */
trait Stage {

  /** Stage id — kebab-cased class name by default (repype/stage.py:149-167). */
  def id: String = Stage.suggestStageId(getClass.getSimpleName.stripSuffix("$"))

  def inputs: Set[String] = Set.empty
  def outputs: Set[String] = Set.empty
  def consumes: Set[String] = Set.empty
  def enabledByDefault: Boolean = true

  /** Implementation version — part of the staleness identity. */
  def version: Int = 0

  /** The transform: declared input fields → declared output fields. */
  def process(ctx: StageContext, inputs: Map[String, DataFrame],
              config: Config): Map[String, DataFrame]

  /** Per-input hyperparameter adoption rules (repype/stage.py:353-397):
    * each rule sets `<stageId>/<key>` = factor × `AF_<key>` with optional
    * clamping — see [[Pipeline.configure]]. */
  def configure(pipeline: Pipeline, inputId: InputId): Seq[ConfigureRule] = Seq.empty

  // -- event callbacks (repype/stage.py:170-203) ---------------------------
  private val callbacks =
    mutable.Map.empty[String, List[StageCallback]].withDefaultValue(Nil)

  def addCallback(event: String, cb: StageCallback): Unit = {
    if (event == "after") { addCallback("end", cb); addCallback("skip", cb) }
    else callbacks(event) = callbacks(event) :+ cb
  }

  def removeCallback(event: String, cb: StageCallback): Unit =
    if (event == "after") { removeCallback("end", cb); removeCallback("skip", cb) }
    else callbacks(event) = callbacks(event).filterNot(_ == cb)

  private[core] def callback(event: String, ctx: StageContext,
                             data: Map[String, DataFrame]): Unit =
    callbacks(event).foreach(_.apply(event, ctx, data))

  /** Guarded execute (repype/stage.py:205-287). Returns (new data, seconds);
    * 0 s when skipped. */
  final def run(ctx: StageContext, data: Map[String, DataFrame],
                config: Config): (Map[String, DataFrame], Double) = {
    val enabled = config.get(s"$id/enabled", enabledByDefault) match {
      case b: Boolean => b
      case other => other != null
    }
    if (enabled) {
      ctx.status.foreach(_.update(Map("info" -> "start-stage", "stage" -> id),
        intermediate = true))
      callback("start", ctx, data)
      val stageConfig = config.get(id, Map.empty[String, Any]) match {
        case c: Config => c
        case _ => Config()
      }
      val missing = inputs.diff(data.keySet)
      require(missing.isEmpty, s"""Stage "$id" is missing inputs: $missing""")
      val inputData = data.view.filterKeys(inputs).toMap
      val t0 = System.nanoTime()
      val outputData = process(ctx, inputData, stageConfig)
      val dt = (System.nanoTime() - t0) / 1e9
      require(outputData.keySet == outputs,
        s"""Stage "$id" produced spurious or missing output: """ +
          s"got ${outputData.keySet}, declared $outputs")
      val newData = (data ++ outputData) -- consumes
      callback("end", ctx, newData)
      (newData, dt)
    } else {
      ctx.status.foreach(_.update(Map("info" -> "skip-stage", "stage" -> id),
        intermediate = true))
      callback("skip", ctx, data)
      (data, 0.0)
    }
  }

  /** Serializable identity of this stage (repype/stage.py:399-434). */
  def signature: Map[String, Any] = Map(
    "class" -> getClass.getName,
    "id" -> id,
    "version" -> version.toLong,
    "inputs" -> inputs.toList.sorted,
    "outputs" -> outputs.toList.sorted,
    "consumes" -> consumes.toList.sorted)

  /** SHA-1 of the signature — the staleness identity
    * (repype/stage.py:436-450). */
  final def sha: String = Json.sha1Of(signature)

  override def toString: String = s"$id (${getClass.getName})"
}

trait StageCallback {
  def apply(event: String, ctx: StageContext, data: Map[String, DataFrame]): Unit
}

/** Linear hyperparameter adoption rule (repype/pipeline.py:80-113):
  * sets `key` to `factor * AF_key` (AF_key defaulting to
  * `defaultUserFactor`), then casts/clamps. `integer=true` rounds to Long. */
final case class ConfigureRule(
    key: String,
    factor: Double,
    defaultUserFactor: Double = 1.0,
    integer: Boolean = false,
    min: Option[Double] = None,
    max: Option[Double] = None)

object Stage {

  /** CamelCase → kebab-case stage id, dropping a trailing "Stage" token
    * (repype/stage.py:58-110): consecutive single-char tokens of the same
    * class (all-alpha or all-numeric) are grouped, e.g.
    * TheGreat123PCMapperStage → the-great-123-pc-mapper. */
  def suggestStageId(className: String): String = {
    require(className != "_" && className.matches("^[a-zA-Z_][a-zA-Z0-9_]*$")
      && className.head.isLetter, s"""Invalid class name: "$className"""")
    val tokens1 = "[a-zA-Z0-9][^A-Z0-9_]*".r.findAllIn(className).toList
    val grouped = mutable.ListBuffer.empty[String]
    var i = 0
    while (i < tokens1.length) {
      var token = tokens1(i)
      i += 1
      if (token.length == 1) {
        var done = false
        while (i < tokens1.length && !done) {
          val t = tokens1(i)
          if (t.length == 1 && (token.forall(_.isDigit) == t.forall(_.isDigit)
            || token.forall(_.isLetter) == t.forall(_.isLetter))) {
            token += t; i += 1
          } else done = true
        }
      }
      grouped += token.toLowerCase.replace("_", "")
    }
    val tokens2 = if (grouped.length >= 2 && grouped.last == "stage")
      grouped.init else grouped
    tokens2.mkString("-")
  }
}
