package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed ground truth for the Naive Bayes tier: exact 4-dp-micro
  * log terms, add-one smoothing, miss mass for unseen terms, prior-only
  * scoring of empty documents, and the label-ascending tie-break. */
class ClassifySpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  /** The engine's fixed-point rule: round(round(ln(x), 4) * 10000). */
  private def micro(x: Double): Long =
    (BigDecimal(math.log(x)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      * 10000).toLongExact

  // class a: "x x y" + "x" -> N_a = 4 (x:3, y:1); class b: "z" + "z z"
  // -> N_b = 3 (z:3); vocab = {x, y, z} = 3; priors 2/4 each
  private lazy val model = Classify.naiveBayesTrain(
    Seq((1L, "a", "x x y"), (2L, "a", "x"),
        (3L, "b", "z"), (4L, "b", "z z"))
      .toDF("doc_id", "lab", "text"), "lab")

  test("training: smoothed log-likelihoods, miss mass, and priors are " +
      "the hand-computed 4-dp micro values") {
    val labs = model.labels.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(labs("a") === (micro(2.0 / 4), micro(1.0 / 7)))
    assert(labs("b") === (micro(2.0 / 4), micro(1.0 / 6)))
    val terms = model.terms.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(terms === Map(
      ("a", "x") -> micro(4.0 / 7), // (3+1)/(4+3)
      ("a", "y") -> micro(2.0 / 7),
      ("b", "z") -> micro(4.0 / 6))) // (3+1)/(3+3)
  }

  test("scoring: seen terms take their class likelihood, unseen take " +
      "the miss mass, empty docs score prior-only with the a<b tiebreak") {
    val scored = Classify.naiveBayesScore(
      Seq((10L, "x z w"), (11L, "")).toDF("doc_id", "text"), model)
    val rows = scored.collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getInt(3))).toMap
    // doc 10: w is unseen by BOTH classes -> miss mass on each side
    val sa = micro(0.5) + micro(4.0 / 7) + micro(1.0 / 7) + micro(1.0 / 7)
    val sb = micro(0.5) + micro(1.0 / 6) + micro(4.0 / 6) + micro(1.0 / 6)
    assert(rows((10L, "a"))._1 === sa)
    assert(rows((10L, "b"))._1 === sb)
    assert(rows((10L, "b"))._2 === 1, "z-heavy class must win doc 10")
    // doc 11 is empty: equal priors -> exact tie -> label ASC wins
    assert(rows((11L, "a")) === (micro(0.5), 1))
    assert(rows((11L, "b")) === (micro(0.5), 2))
  }
}
