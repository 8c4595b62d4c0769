package graft.core

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Mirrors tests/test_stage.py: id suggestion, run semantics (missing /
  * spurious outputs), enabled/skip, callbacks, signature stability. */
class StageSpec extends SparkSpec {

  test("suggestStageId tokenization") {
    assert(Stage.suggestStageId("TheGreatMapperStage") == "the-great-mapper")
    assert(Stage.suggestStageId("TheGreat123PCMapper") == "the-great-123-pc-mapper")
    assert(Stage.suggestStageId("Download") == "download")
    assert(Stage.suggestStageId("HTTPFetch") == "http-fetch")
    assert(Stage.suggestStageId("Stage") == "stage") // single token kept
    intercept[IllegalArgumentException](Stage.suggestStageId("_"))
    intercept[IllegalArgumentException](Stage.suggestStageId("1Bad"))
  }

  private def df(n: Long): DataFrame = {
    import SparkSpec.spark.implicits._
    (0L until n).toDF("v")
  }

  private class AddOne extends Stage {
    override def id = "add-one"
    override def inputs = Set("x")
    override def outputs = Set("y")
    def process(ctx: StageContext, in: Map[String, DataFrame], cfg: Config) =
      Map("y" -> in("x"))
  }

  private def ctx(p: Pipeline) = StageContext(spark, p, InputId(1))

  test("run extracts inputs, merges outputs, times") {
    val p = new Pipeline(spark)
    val st = new AddOne
    val (out, dt) = st.run(ctx(p), Map("x" -> df(3)), Config())
    assert(out.contains("y") && out.contains("x"))
    assert(dt >= 0)
  }

  test("missing input fails") {
    val st = new AddOne
    intercept[IllegalArgumentException](
      st.run(ctx(new Pipeline(spark)), Map.empty, Config()))
  }

  test("spurious/missing output fails") {
    val bad = new Stage {
      override def id = "bad"
      override def outputs = Set("a")
      def process(ctx: StageContext, in: Map[String, DataFrame], cfg: Config) =
        Map("b" -> df(1))
    }
    intercept[IllegalArgumentException](
      bad.run(ctx(new Pipeline(spark)), Map.empty, Config()))
  }

  test("consumes removes fields") {
    val consumer = new Stage {
      override def id = "consumer"
      override def inputs = Set("x")
      override def outputs = Set("y")
      override def consumes = Set("x")
      def process(ctx: StageContext, in: Map[String, DataFrame], cfg: Config) =
        Map("y" -> in("x"))
    }
    val (out, _) = consumer.run(ctx(new Pipeline(spark)), Map("x" -> df(2)), Config())
    assert(out.keySet == Set("y"))
  }

  test("disabled stage skips with zero time and skip callback") {
    var events = List.empty[String]
    val st = new AddOne
    st.addCallback("after", (e: String, _: StageContext, _: Map[String, DataFrame]) =>
      events :+= e)
    val cfg = Config().updated("add-one/enabled", false)
    val (out, dt) = st.run(ctx(new Pipeline(spark)), Map("x" -> df(2)), cfg)
    assert(dt == 0.0 && !out.contains("y"))
    assert(events == List("skip"))
    val (_, dt2) = st.run(ctx(new Pipeline(spark)), Map("x" -> df(2)), Config())
    assert(dt2 > 0 && events == List("skip", "end"))
  }

  test("enabledByDefault=false requires explicit enable") {
    val st = new AddOne { override def enabledByDefault = false }
    val (out1, _) = st.run(ctx(new Pipeline(spark)), Map("x" -> df(2)), Config())
    assert(!out1.contains("y"))
    val (out2, _) = st.run(ctx(new Pipeline(spark)), Map("x" -> df(2)),
      Config().updated("add-one/enabled", true))
    assert(out2.contains("y"))
  }

  test("sha stable across instances, sensitive to version") {
    val a = new AddOne
    val b = new AddOne
    assert(a.sha == b.sha)
    val v2 = new AddOne { override def version = 2 }
    assert(a.sha != v2.sha)
  }
}
