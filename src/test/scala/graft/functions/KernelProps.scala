package graft.functions

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String

/** Property-based invariants for the native text kernels (pure JVM — no
  * Spark jobs, so the case counts can be generous). Each kernel is
  * checked against an INDEPENDENT naive reference implementation written
  * differently (full-matrix DP for LCS; a direct transcription of the
  * published Jaro-Winkler definition), plus the algebraic guarantees. */
object KernelProps extends Properties("graft.functions.kernels") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  private val word = Gen.oneOf("a", "b", "c", "ab", "xyz")
  private val tokensGen = Gen.listOf(word)
  private val strGen = Gen.listOf(Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)

  private def lcsRef(a: Seq[String], b: Seq[String]): Long = {
    // full-matrix DP — deliberately NOT the rolling-row production code
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) =
        if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    dp(a.length)(b.length).toLong
  }

  private def lcs(a: Seq[String], b: Seq[String]): Long =
    Lcs.lcsLen(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        a.map(UTF8String.fromString).toArray),
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        b.map(UTF8String.fromString).toArray))

  property("lcsLen equals the full-matrix reference") =
    forAll(tokensGen, tokensGen) { (a, b) => lcs(a, b) == lcsRef(a, b) }

  property("lcsLen is symmetric, bounded by min length, and maximal on " +
    "a subsequence") =
    forAll(tokensGen, tokensGen) { (a, b) =>
      val v = lcs(a, b)
      v == lcs(b, a) && v <= math.min(a.length, b.length) &&
        lcs(a, a) == a.length.toLong &&
        // every-other-element is a subsequence: LCS = its length
        (lcs(a, a.zipWithIndex.collect { case (x, i) if i % 2 == 0 => x })
          == ((a.length + 1) / 2).toLong)
    }

  private def jaroRef(a: String, b: String): Double = {
    // direct transcription of the published definition (match window,
    // greedy marking, ordered transposition walk, integer halving)
    val (l1, l2) = (a.length, b.length)
    if (l1 == 0 || l2 == 0) return 0.0
    if (a == b) return 1.0
    val w = math.max(0, math.max(l1, l2) / 2 - 1)
    val mb = Array.fill(l2)(false)
    val matchedA = scala.collection.mutable.ArrayBuffer[Char]()
    val matchedBIdx = scala.collection.mutable.ArrayBuffer[Int]()
    for (i <- 0 until l1) {
      val js = (math.max(0, i - w) to math.min(l2 - 1, i + w))
        .find(j => !mb(j) && a(i) == b(j))
      js.foreach { j => mb(j) = true; matchedA += a(i); matchedBIdx += j }
    }
    val m = matchedA.length
    if (m == 0) return 0.0
    val matchedB = matchedBIdx.sorted.map(b(_))
    val t = matchedA.zip(matchedB).count { case (x, y) => x != y } / 2
    (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
  }

  private def jwRef(a: String, b: String): Double = {
    val j = jaroRef(a, b)
    if (j > 0.7) {
      val p = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.length
      j + p * 0.1 * (1.0 - j)
    } else j
  }

  private def jw(a: String, b: String): Double =
    Jaro.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  property("jaroWinkler equals the definitional reference") =
    forAll(strGen, strGen) { (a, b) =>
      math.abs(jw(a, b) - jwRef(a, b)) < 1e-12
    }

  property("jaroWinkler is symmetric, in [0,1], 1 on equal non-empty, " +
    "0 on either-empty") =
    forAll(strGen, strGen) { (a, b) =>
      val v = jw(a, b)
      v == jw(b, a) && v >= 0.0 && v <= 1.0 &&
        (a.isEmpty || jw(a, a) == 1.0) && jw("", b) == 0.0
    }
}
