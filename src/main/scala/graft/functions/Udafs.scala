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
}
