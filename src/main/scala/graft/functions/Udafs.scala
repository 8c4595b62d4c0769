package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** Typed custom aggregates — the engine's UDAF surface (SURVEY.md §2.b
  * "UDF / UDAF / UDTF"), the faithful port of arbitrary per-group
  * `Stage.process` compute (repype/stage.py:324-351) to Spark's
  * `Aggregator`, which plans as a partial→final aggregate (map-side
  * combine) like any built-in — the 100 TB-safe shape.
  */
object Udafs {

  /** Geometric mean via Σln — numerically stable, mergeable. */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) =
      if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** value/weight pair → Σwx / Σw. */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), x: (Double, Double)): (Double, Double) =
      (b._1 + x._1 * x._2, b._2 + x._2)
    def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Double)): Double =
      if (b._2 == 0) Double.NaN else b._1 / b._2
    def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def geoMean(col: Column): Column = functions.udaf(GeoMean).apply(col)
  def weightedMean(value: Column, weight: Column): Column =
    functions.udaf(WeightedMean).apply(value, weight)

  /** Misra–Gries frequent-items sketch: at most `k-1` counters, O(k)
    * memory regardless of stream length, mergeable (Agarwal et al., "
    * Mergeable Summaries", PODS'12: pairwise counter subtraction keeps
    * the ε = n/k error bound under merge). Guarantee: every item with
    * true frequency > n/k SURVIVES in the sketch (no false negatives);
    * counts are underestimates by at most n/k. The intended 100 TB use is
    * two-pass heavy hitters: this sketch produces a candidate set with a
    * partial→final aggregate (map-side combine, ~k·|item| bytes per
    * partial), then one semi-join recounts candidates exactly — see
    * `q_heavy_hitters`.
    */
  final class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 1, "k must be > 1")

    def zero: Map[String, Long] = Map.empty

    private def shrink(m: Map[String, Long]): Map[String, Long] =
      if (m.size < k) m
      else {
        // decrement-all step: subtract the smallest count from everyone;
        // zeros drop out. One pass, keeps <= k-1 counters.
        val dec = m.values.min
        m.flatMap { case (s, c) => if (c > dec) Some(s -> (c - dec)) else None }
      }

    def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      shrink(b.updated(x, b.getOrElse(x, 0L) + 1L))

    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      // counter-wise sum, then repeated decrement back down to k-1
      // counters (the PODS'12 mergeable form preserves the error bound)
      var m = b.foldLeft(a) { case (acc, (s, c)) =>
        acc.updated(s, acc.getOrElse(s, 0L) + c)
      }
      while (m.size >= k) m = shrink(m)
      m
    }

    def finish(b: Map[String, Long]): Map[String, Long] = b

    // ExpressionEncoder (not kryo): the buffer/result stay a Catalyst
    // MapType, so partials ship in Tungsten format and `map_keys` applies
    // directly to the result.
    def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Frequent-item CANDIDATES (keys of the MG sketch) over a string
    * column: complete for every item with frequency > n/k. */
  def frequentCandidates(col: Column, k: Int): Column =
    functions.map_keys(functions.udaf(new MisraGries(k)).apply(col))
}
