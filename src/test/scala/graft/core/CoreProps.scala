package graft.core

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants for the driver-side core (no SparkSession —
  * these run in milliseconds and cover the parsing/merging/identity logic
  * that the example-based specs only spot-check). */
object CoreProps extends Properties("graft.core") {

  // -- InputId ---------------------------------------------------------------

  property("decode(list) sorts and dedups numerically") =
    forAll(Gen.listOf(Gen.chooseNum(0L, 9999L))) { ids =>
      InputId.decode(ids) == ids.distinct.sorted.map(InputId.Num.apply)
    }

  property("decode(render csv) round-trips") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(0L, 9999L))) { ids =>
      val csv = ids.map(_.toString).mkString(",")
      InputId.decode(csv) == ids.distinct.sorted.map(InputId.Num.apply)
    }

  property("decode range a-b equals the inclusive span") =
    forAll(Gen.chooseNum(0L, 500L), Gen.chooseNum(1L, 500L)) { (a, span) =>
      val b = a + span
      InputId.decode(s"$a-$b") == (a to b).map(InputId.Num.apply).toList
    }

  property("numeric ids order before string ids") =
    forAll(Gen.chooseNum(0L, 9999L), Gen.alphaStr.suchThat(s =>
      s.nonEmpty && !s.forall(_.isDigit))) { (n, s) =>
      (InputId(n): InputId).compare(InputId(s)) < 0
    }

  // -- Config ----------------------------------------------------------------

  private val scalarGen: Gen[Any] = Gen.oneOf(
    Gen.chooseNum(-1000L, 1000L), Gen.alphaStr, Gen.oneOf(true, false))
  private val pathGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty))
      .map(_.take(3).mkString("/"))

  property("set then get returns the value at any path depth") =
    forAll(pathGen, scalarGen) { (path, v) =>
      Config().updated(path, v).get(path, null) == v
    }

  property("merge with empty is identity (both sides)") =
    forAll(pathGen, scalarGen) { (path, v) =>
      val c = Config().updated(path, v)
      c.merge(Config()).entries == c.entries &&
        Config().merge(c).entries == c.entries
    }

  property("right side of merge wins on conflicts") =
    forAll(pathGen, scalarGen, scalarGen) { (path, v1, v2) =>
      Config().updated(path, v1).merge(Config().updated(path, v2))
        .get(path, null) == v2
    }

  property("sha is order-insensitive over entry insertion") =
    forAll(Gen.listOfN(5, Gen.zip(pathGen, scalarGen))) { kvs0 =>
      // prefix each path with a unique root — duplicate or
      // prefix-overlapping paths would make insertion order matter
      // legitimately (last write wins), which is not what's under test
      val kvs = kvs0.zipWithIndex.map { case ((k, v), i) => (s"r$i/$k", v) }
      val a = kvs.foldLeft(Config()) { case (c, (k, v)) => c.updated(k, v) }
      val b = kvs.reverse.foldLeft(Config()) { case (c, (k, v)) => c.updated(k, v) }
      a.sha == b.sha
    }

  // -- Stage id suggestion ---------------------------------------------------

  private val classNameGen: Gen[String] = for {
    head <- Gen.alphaUpperChar
    tail <- Gen.listOf(Gen.frequency(
      8 -> Gen.alphaChar, 2 -> Gen.numChar)).map(_.mkString)
  } yield head + tail

  property("suggestStageId emits only [a-z0-9-]") =
    forAll(classNameGen) { name =>
      Stage.suggestStageId(name).matches("^[a-z0-9-]*$")
    }

  property("suggestStageId drops a trailing Stage token") =
    forAll(classNameGen.suchThat(_.nonEmpty)) { name =>
      val withSuffix = name + "Stage"
      val id = Stage.suggestStageId(withSuffix)
      !id.endsWith("-stage") && id == Stage.suggestStageId(withSuffix)
    }

  // -- Status ----------------------------------------------------------------

  property("formatHms reconstructs total seconds") =
    forAll(Gen.chooseNum(0L, 360000L)) { s =>
      val parts = Status.formatHms(s.toDouble).split(":").map(_.toLong)
      val total = parts.reverse.zipWithIndex
        .map { case (p, i) => p * math.pow(60, i).toLong }.sum
      total == s
    }

  // -- Json ------------------------------------------------------------------

  property("canonical JSON round-trips through the parser") =
    forAll(Gen.mapOfN(4, Gen.zip(Gen.identifier.map(_.take(6)), scalarGen))) { m =>
      val plain: Map[String, Any] = m
      Json.parseJson(Json.canonical(plain)) == plain
    }

  property("sha1Of is insensitive to map ordering") = Prop.forAll(
    Gen.listOfN(6, Gen.zip(Gen.identifier.map(_.take(6)), scalarGen))) { kvs =>
    val uniq = kvs.distinctBy(_._1) // duplicate keys would make the two
    val m1 = uniq.toMap             // construction orders keep different
    val m2 = uniq.reverse.toMap     // winners — not what's under test
    Json.sha1Of(m1) == Json.sha1Of(m2)
  }
}
