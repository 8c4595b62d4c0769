package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the Misra–Gries sketch's pure logic —
  * no SparkSession, so these cover arbitrary streams AND arbitrary
  * partition splits (reduce within parts, merge across) far beyond what
  * the example-based MisraGriesSpec exercises.
  */
object MisraGriesProps extends Properties("graft.functions.MisraGries") {

  // skewed alphabet: small id space so heavy items actually occur
  private val streamGen: Gen[List[String]] =
    Gen.listOf(Gen.frequency(
      5 -> Gen.const("hot"),
      3 -> Gen.const("warm"),
      4 -> Gen.chooseNum(0, 50).map(i => s"t$i")))

  private val kGen: Gen[Int] = Gen.chooseNum(2, 12)

  /** Fold a stream through reduce/merge along an arbitrary split. */
  private def sketch(mg: Udafs.MisraGries, parts: List[List[String]]) =
    parts.map(_.foldLeft(mg.zero)(mg.reduce)).foldLeft(mg.zero)(mg.merge)

  private def splits(xs: List[String], at: List[Int]): List[List[String]] =
    at.sorted.distinct.foldRight((xs, List.empty[List[String]])) {
      case (i, (rest, acc)) =>
        val (a, b) = rest.splitAt(math.min(i, rest.length))
        (a, b :: acc)
    } match { case (last, acc) => last :: acc }

  property("no false negatives above n/k, under any partition split") =
    forAll(streamGen, kGen, Gen.listOf(Gen.chooseNum(0, 200))) { (xs, k, cuts) =>
      val mg = new Udafs.MisraGries(k)
      val m = sketch(mg, splits(xs, cuts))
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
      exact.forall { case (item, c) =>
        c * k <= xs.length || m.contains(item)
      }
    }

  property("counts never overestimate; at most k-1 counters") =
    forAll(streamGen, kGen, Gen.listOf(Gen.chooseNum(0, 200))) { (xs, k, cuts) =>
      val mg = new Udafs.MisraGries(k)
      val m = sketch(mg, splits(xs, cuts))
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      m.size <= k - 1 &&
        m.forall { case (item, c) => c <= exact.getOrElse(item, 0L) }
    }
}
