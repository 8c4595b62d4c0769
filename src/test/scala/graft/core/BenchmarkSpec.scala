package graft.core

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors tests/test_benchmark.py: get/set, retain subset preserving
  * order, CSV save/load round-trip, setAll adoption. */
class BenchmarkSpec extends AnyFunSuite {

  private def path() = new HPath(
    Files.createTempDirectory("bench").toString, "times.csv")

  test("set/get and shape") {
    val b = new Benchmark(path())
    b.set("s1", InputId(1), 1.5)
    b.set("s2", InputId(1), 2.5)
    b.set("s1", InputId(2), 3.5)
    assert(b.get("s1", InputId(1)).contains(1.5))
    assert(b.get("s2", InputId(2)).isEmpty)
    assert(b.shape == (2, 2))
  }

  test("save/load round-trip preserves values and layout") {
    val p = path()
    val b = new Benchmark(p)
    b.set("scan", InputId(1), 0.25)
    b.set("agg", InputId(1), 1.75)
    b.save()
    val loaded = Benchmark.load(p)
    assert(loaded.get("scan", InputId(1)).contains(0.25))
    assert(loaded.get("agg", InputId(1)).contains(1.75))
    assert(loaded.shape == (2, 1))
    // CSV layout: header = input ids, first column = stage ids
    val lines = java.util.List.of(
      SidecarFs.readString(p.toString).get.split("\n"): _*)
    assert(lines.get(0) == ",1")
    assert(lines.get(1).startsWith("scan,"))
  }

  test("retain keeps given order and drops the rest") {
    val b = new Benchmark(path())
    for (s <- Seq("a", "b", "c"); i <- Seq(1, 2, 3))
      b.set(s, InputId(i), i.toDouble)
    b.retain(Seq("c", "a"), Seq(InputId(3), InputId(1)))
    assert(b.shape == (2, 2))
    assert(b.get("b", InputId(1)).isEmpty)
    assert(b.get("c", InputId(3)).contains(3.0))
    b.save()
    val lines = java.util.List.of(
      SidecarFs.readString(b.filepath.toString).get.split("\n"): _*)
    assert(lines.get(0) == ",3,1")   // retained column order
    assert(lines.get(1).startsWith("c,"))
    assert(lines.get(2).startsWith("a,"))
  }

  test("setAll adopts values from another benchmark") {
    val a = new Benchmark(path())
    a.set("s", InputId(1), 1.0)
    val b = new Benchmark(path())
    b.set("s", InputId(2), 2.0)
    a.setAll(b)
    assert(a.get("s", InputId(1)).contains(1.0))
    assert(a.get("s", InputId(2)).contains(2.0))
  }
}
