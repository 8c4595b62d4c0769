package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-based corpus filtering, trained IN the engine: a multinomial
  * Naive Bayes text classifier — the SQL-replayable cousin of the
  * fastText linear filters every production pretraining pipeline runs
  * (CCNet's quality classifier, language-ID gates, domain routers). The
  * engine's heuristic filters (C4 rules, n-gram language-ID, the quality
  * battery in [[TextAnalysis]]) cover the rule-based tier; this adds the
  * LEARNED tier without leaving the cluster: train on a labeled slice
  * (labels are free — `lang`, `source`, or any upstream verdict column),
  * score the corpus, keep/route by predicted class.
  *
  * Exactness (the q_retrieval_ql ln discipline): every log term is fixed
  * to 4-dp micro-units (`round(round(ln(x), 4) * 10000)` as BIGINT)
  * BEFORE any addition, token counts and Laplace smoothing are integer
  * by construction, and a document's class score is
  * `logprior_micro + Σ_t tf · llik_micro(c, t)` — an exact BIGINT sum,
  * so train AND score hash-replay on any engine. Ties break to the
  * lexicographically smallest label (the engine-wide argmax rule).
  *
  * Scale shape: training is two hash aggregations over the tokenized
  * training slice (per-(label, term) counts, per-label totals) + one
  * distinct-vocab count — all linear, key space vocabulary-bounded.
  * Scoring joins the scoring tokens against the (label, term) model — a
  * vocabulary-bounded table, broadcast when it fits, plain equi-join
  * when not — then one per-(doc, label) aggregation; the label grid
  * multiplies rows by |labels| (small by contract: a router has a
  * handful of classes). Document text never shuffles; only (doc, term,
  * tf) rows move.
  */
object Classify {

  /** The trained model, two bounded frames:
    *  - `labels`: (label, logprior_micro, miss_micro) — one row per
    *    class; `miss_micro` is the smoothed log-likelihood of a term the
    *    class never saw (`ln(1 / (N_c + V))`), which is also the correct
    *    value for terms other classes saw (count 0 ⇒ same formula).
    *  - `terms`: (label, term, llik_micro) — one row per class × seen
    *    term, `ln((count + 1) / (N_c + V))` in 4-dp micro. */
  final case class NbModel(labels: DataFrame, terms: DataFrame)

  private def micro(c: org.apache.spark.sql.Column) =
    round(round(log(c), 4) * 10000).cast("long")

  private def toks(docs: DataFrame, textCol: String, keyCols: Seq[String]) =
    docs.select(keyCols.map(col) :+
        explode(split(col(textCol), " ")).as("term"): _*)
      .filter(col("term") =!= "")

  /** Train multinomial NB with add-one smoothing on `docs[labelCol]`.
    * Every document counts toward its class prior (an empty text still
    * carries its label); vocabulary V is the distinct-term count of the
    * TRAINING slice. */
  def naiveBayesTrain(docs: DataFrame, labelCol: String,
                      textCol: String = "text"): NbModel = {
    val t = toks(docs, textCol, Seq(labelCol)).select(
      col(labelCol).as("label"), col("term"))
    val vocab = t.select(col("term")).distinct().count()
    val classTotals = t.groupBy(col("label"))
      .agg(count(lit(1)).as("n_c"))
    val nDocs = docs.count()
    val priors = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs_c"))
      .join(classTotals, Seq("label"), "left")
      .na.fill(0L, Seq("n_c")) // a class whose every doc is empty text
      .select(col("label"),
        micro(col("n_docs_c").cast("double") / lit(nDocs.toDouble))
          .as("logprior_micro"),
        micro(lit(1.0) / (col("n_c") + lit(vocab)).cast("double"))
          .as("miss_micro"))
    val terms = t.groupBy(col("label"), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .join(classTotals, Seq("label"))
      .select(col("label"), col("term"),
        micro((col("cnt") + 1).cast("double")
          / (col("n_c") + lit(vocab)).cast("double")).as("llik_micro"))
    NbModel(priors, terms)
  }

  /** Score `docs` against a trained model: every document gets every
    * class's exact BIGINT log-score; `rk` ranks classes per document
    * (score DESC, label ASC). Keep `rk = 1` for the argmax routing
    * verdict, or all rows for margin/abstention logic downstream. */
  def naiveBayesScore(docs: DataFrame, model: NbModel,
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val tf = toks(docs, textCol, Seq(idCol))
      .groupBy(col(idCol).as("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val lab = broadcast(model.labels) // |classes| rows by contract
    // per-(doc, label) token evidence: model terms are vocabulary-
    // bounded, so AQE broadcasts the join when they fit
    val evidence = tf.join(lab, lit(true))
      .join(model.terms, Seq("label", "term"), "left")
      .withColumn("ll", coalesce(col("llik_micro"), col("miss_micro")))
      .groupBy(col("doc_id"), col("label"))
      .agg(sum(col("tf") * col("ll")).as("tok_micro"))
    // empty-text documents still score (prior only): outer grid
    docs.select(col(idCol).as("doc_id")).crossJoin(lab
        .select(col("label"), col("logprior_micro").as("lp")))
      .join(evidence, Seq("doc_id", "label"), "left")
      .select(col("doc_id"), col("label"),
        (coalesce(col("tok_micro"), lit(0L)) + col("lp"))
          .as("score_micro"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("score_micro").desc, col("label"))))
  }
}
