package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors tests/test_config.py — every Config method. */
class ConfigSpec extends AnyFunSuite {

  private val c = Config(Map(
    "stage1" -> Map("alpha" -> 1L, "beta" -> Map("gamma" -> "x")),
    "top" -> 2.5))

  test("get with '/' paths and defaults") {
    assert(c.get("stage1/alpha", 0L) == 1L)
    assert(c.get("stage1/beta/gamma", "") == "x")
    assert(c.get("stage1/missing", 42L) == 42L)
    assert(c.get("nope/deep/key", "d") == "d")
    assert(c.get("top", 0.0) == 2.5)
  }

  test("nested section comes back as Config") {
    val sub = c.get("stage1", Map.empty[String, Any]).asInstanceOf[Config]
    assert(sub.get("alpha", 0L) == 1L)
  }

  test("contains") {
    assert(c.contains("stage1/beta/gamma"))
    assert(!c.contains("stage1/beta/missing"))
    assert(!c.contains("missing"))
  }

  test("updated auto-vivifies intermediate sections") {
    val c2 = c.updated("a/b/c", 7)
    assert(c2.get("a/b/c", 0L) == 7L)
    // original untouched (immutability)
    assert(!c.contains("a/b/c"))
  }

  test("setDefault only sets unset keys; overrideNone") {
    assert(c.setDefault("stage1/alpha", 99L).get("stage1/alpha", 0L) == 1L)
    assert(c.setDefault("new/key", 5L).get("new/key", 0L) == 5L)
    val withNull = c.updated("n", null)
    assert(withNull.setDefault("n", 3L).getOpt("n").contains(null))
    assert(withNull.setDefault("n", 3L, overrideNone = true).get("n", 0L) == 3L)
  }

  test("popped removes and returns") {
    val (v, c2) = c.popped("stage1/alpha", -1L)
    assert(v == 1L && !c2.contains("stage1/alpha"))
    assert(c2.contains("stage1/beta/gamma"))
    val (d, c3) = c.popped("missing", -1L)
    assert(d == -1L && c3 == c)
  }

  test("merge: other takes precedence, deep") {
    val other = Config(Map(
      "stage1" -> Map("alpha" -> 10L, "delta" -> true), "extra" -> "e"))
    val m = c.merge(other)
    assert(m.get("stage1/alpha", 0L) == 10L)
    assert(m.get("stage1/beta/gamma", "") == "x") // preserved
    assert(m.get("stage1/delta", false) == true)
    assert(m.get("extra", "") == "e")
  }

  test("merge is associative on nested maps (property)") {
    // Key kind is fixed per key name (a/b/c scalar, m/n section): scalar-vs-
    // section conflicts are excluded — the reference's merge is not defined
    // on them either (it crashes, repype/config.py:216-235).
    val rnd = new scala.util.Random(7)
    def randMap(depth: Int): Map[String, Any] =
      Seq.fill(rnd.nextInt(5))({
        val scalarKey = rnd.nextBoolean() || depth == 0
        if (scalarKey)
          ("abc" (rnd.nextInt(3)).toString,
            if (rnd.nextBoolean()) rnd.nextInt(10).toLong
            else rnd.nextPrintableChar().toString)
        else ("mn" (rnd.nextInt(2)).toString, randMap(depth - 1): Any)
      }).toMap
    for (_ <- 1 to 200) {
      val (a, b, cc) = (randMap(2), randMap(2), randMap(2))
      val l = Config(a).merge(Config(b)).merge(Config(cc))
      val r = Config(a).merge(Config(b).merge(Config(cc)))
      assert(l == r, s"not associative for $a, $b, $cc")
    }
  }

  test("sha stable and sensitive") {
    assert(c.sha == Config(c.entries).sha)
    assert(c.sha != c.updated("x", 1L).sha)
    // key order does not matter (canonical JSON)
    assert(Config(Map("a" -> 1L, "b" -> 2L)).sha == Config(Map("b" -> 2L, "a" -> 1L)).sha)
  }

  test("yaml round-trip") {
    val back = Config.fromYaml(c.yaml)
    assert(back == c)
  }
}
