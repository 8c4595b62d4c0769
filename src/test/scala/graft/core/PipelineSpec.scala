package graft.core

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Mirrors tests/test_pipeline.py: toposort + failure modes, process
  * windows (first/last/"+"), extraStages closure, configure rules,
  * fields/persistentFields, InputId.decode. */
class PipelineSpec extends SparkSpec {

  private def mkStage(sid: String, ins: Set[String], outs: Set[String],
                      cons: Set[String] = Set.empty): Stage = new Stage {
    override def id = sid
    override def inputs = ins
    override def outputs = outs
    override def consumes = cons
    def process(ctx: StageContext, in: Map[String, DataFrame], cfg: Config) = {
      import ctx.spark.implicits._
      outs.map(_ -> Seq(sid).toDF("from")).toMap
    }
  }

  test("create toposorts by field dependencies") {
    val a = mkStage("a", Set.empty, Set("f1"))
    val b = mkStage("b", Set("f1"), Set("f2"))
    val c = mkStage("c", Set("f1", "f2"), Set("f3"))
    val p = Pipeline.create(spark, Seq(c, b, a))
    assert(p.stages.map(_.id) == Vector("a", "b", "c"))
  }

  test("create avoids scheduling consumers before readers") {
    val a = mkStage("a", Set.empty, Set("f1"))
    val eat = mkStage("eat", Set("f1"), Set("g"), cons = Set("f1"))
    val read = mkStage("read", Set("f1"), Set("h"))
    val p = Pipeline.create(spark, Seq(eat, a, read))
    assert(p.stages.map(_.id).indexOf("read") < p.stages.map(_.id).indexOf("eat"))
  }

  test("create rejects ambiguous ids, ambiguous outputs, unsatisfiable deps") {
    val a1 = mkStage("a", Set.empty, Set("f1"))
    val a2 = mkStage("a", Set.empty, Set("f2"))
    intercept[IllegalArgumentException](Pipeline.create(spark, Seq(a1, a2)))
    val o1 = mkStage("x", Set.empty, Set("f"))
    val o2 = mkStage("y", Set.empty, Set("f"))
    intercept[IllegalArgumentException](Pipeline.create(spark, Seq(o1, o2)))
    val needs = mkStage("n", Set("missing"), Set("out"))
    intercept[RuntimeException](Pipeline.create(spark, Seq(needs)))
  }

  test("process runs all stages and returns times") {
    val a = mkStage("a", Set.empty, Set("f1"))
    val b = mkStage("b", Set("f1"), Set("f2"))
    val p = Pipeline.create(spark, Seq(a, b))
    val (data, _, times) = p.process(InputId(1), Config())
    assert(data.keySet == Set("input_id", "f1", "f2"))
    assert(times.keySet == Set("a", "b"))
  }

  test("process window: first/last and 'stage+' suffix") {
    val a = mkStage("a", Set.empty, Set("f1"))
    val b = mkStage("b", Set.empty, Set("f2"))
    val c = mkStage("c", Set.empty, Set("f3"))
    val p = Pipeline.create(spark, Seq(a, b, c))
    val (_, _, t1) = p.process(InputId(1), Config(), firstStage = Some("b"))
    assert(t1.keySet == Set("b", "c"))
    val (_, _, t2) = p.process(InputId(1), Config(), lastStage = Some("b"))
    assert(t2.keySet == Set("a", "b"))
    val (_, _, t3) = p.process(InputId(1), Config(), firstStage = Some("a+"))
    assert(t3.keySet == Set("b", "c"))
    val (_, _, t4) = p.process(InputId(1), Config(), firstStage = Some("c+"))
    assert(t4.isEmpty)
  }

  test("process window pulls extra stages for missing inputs") {
    val a = mkStage("a", Set.empty, Set("f1"))
    val b = mkStage("b", Set("f1"), Set("f2"))
    val p = Pipeline.create(spark, Seq(a, b))
    // start at b with no data: a must be pulled in as extra
    val (data, _, times) = p.process(InputId(1), Config(), firstStage = Some("b"))
    assert(times.keySet == Set("a", "b"))
    assert(data.contains("f2"))
  }

  test("extraStages closure") {
    val a = mkStage("a", Set.empty, Set("f1"))
    val b = mkStage("b", Set("f1"), Set("f2"))
    val c = mkStage("c", Set("f2"), Set("f3"))
    val p = Pipeline.create(spark, Seq(a, b, c))
    assert(p.extraStages(Some("c"), None, Set.empty) == List("b", "a"))
    assert(p.extraStages(Some("c"), None, Set("f2")) == Nil)
  }

  test("StageError wraps process failures with stage id") {
    val boom = new Stage {
      override def id = "boom"
      override def outputs = Set("x")
      def process(ctx: StageContext, in: Map[String, DataFrame], cfg: Config) =
        throw new RuntimeException("nope")
    }
    val p = Pipeline.create(spark, Seq(boom))
    val e = intercept[StageError](p.process(InputId(1), Config()))
    assert(e.stageId == "boom")
  }

  test("configure applies AF_ factor rules with clamping") {
    val st = new Stage {
      override def id = "seg"
      override def outputs = Set("o")
      override def configure(p: Pipeline, i: InputId) = Seq(
        ConfigureRule("sigma", factor = 2.0),
        ConfigureRule("radius", factor = 10.0, integer = true, min = Some(5.0),
          max = Some(8.0)))
      def process(ctx: StageContext, in: Map[String, DataFrame], cfg: Config) =
        Map("o" -> null)
    }
    val p = Pipeline.create(spark, Seq(st))
    val cfg = p.configure(Config().updated("seg/AF_sigma", 3.0), InputId(1))
    assert(cfg.get("seg/sigma", 0.0) == 6.0)      // 2.0 * AF 3.0
    assert(cfg.get("seg/radius", 0L) == 8L)       // 10*1 clamped to max 8, int
    // explicit value wins over the rule
    val cfg2 = p.configure(Config().updated("seg/sigma", 1.25), InputId(1))
    assert(cfg2.get("seg/sigma", 0.0) == 1.25)
  }

  test("fields and persistentFields") {
    val a = mkStage("a", Set.empty, Set("f1"))
    val eat = mkStage("eat", Set("f1"), Set("f2"), cons = Set("f1"))
    val p = Pipeline.create(spark, Seq(a, eat))
    assert(p.fields == Set("input_id", "f1", "f2"))
    assert(p.persistentFields == Set("input_id", "f2"))
  }

  test("resolve scope templating") {
    val p = new Pipeline(spark, Seq.empty, Map("result" -> "/tmp/out/%s.parquet"))
    assert(p.resolve("result", InputId(7)).get.toString == "/tmp/out/7.parquet")
    assert(p.resolve("missing", InputId(7)).isEmpty)
  }

  test("InputId.decode ranges, dedup, sorting, strings") {
    assert(InputId.decode("1-5, 8") ==
      List(1L, 2L, 3L, 4L, 5L, 8L).map(InputId(_)))
    assert(InputId.decode("3,1,3") == List(InputId(1), InputId(3)))
    assert(InputId.decode("a, 2") == List(InputId(2), InputId.Str("a")))
    assert(InputId.decode(Seq(5, 2)) == List(InputId(2), InputId(5)))
    assert(InputId.decode(7) == List(InputId(7)))
    assert(InputId.decode("") == Nil)
    intercept[IllegalArgumentException](InputId.decode("5-2"))
    intercept[IllegalArgumentException](InputId.decode("5-"))
  }
}
