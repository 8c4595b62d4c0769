package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ingestion robustness — the two failure modes a long-lived 100 TB table
  * actually hits: producers evolving the schema between batches, and
  * corrupt records inside semi-structured input. Neither may silently
  * drop or corrupt data. */
class IngestRobustnessSpec extends SparkSpec {

  test("parquet mergeSchema unifies evolved batches; old rows get nulls") {
    import SparkSpec.spark.implicits._
    val base = s"/root/repo/target/tmp/evolve_${System.nanoTime()}"
    // batch 1: (id, a); batch 2 adds column b — the additive-evolution
    // path (dir names must not look like k=v, or partition discovery
    // would invent a column)
    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .write.parquet(s"$base/batch1")
    Seq((3L, "z", 10L), (4L, "w", 20L)).toDF("id", "a", "b")
      .write.parquet(s"$base/batch2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$base/batch1", s"$base/batch2")
    assert(merged.columns.toSet == Set("id", "a", "b"))
    assert(merged.count() == 4)
    // rows from the old batch surface the new column as null, not garbage
    assert(merged.filter(col("b").isNull).select(col("id"))
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(merged.filter(col("b") === 20L).select(col("id")).head().getLong(0) == 4L)
  }

  test("JSON corrupt records are quarantined, not dropped or fatal") {
    val base = s"/root/repo/target/tmp/corrupt_${System.nanoTime()}"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(base))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$base/part.json"),
      """{"id": 1, "v": "ok"}
        |this is not json at all
        |{"id": 2, "v": "also ok"}
        |{"id": 3, "v": BROKEN
        |""".stripMargin)
    val schema = "id BIGINT, v STRING, _corrupt_record STRING"
    val read = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(base)
      .cache() // corrupt-record column requires a materialized scan
    try {
      assert(read.count() == 4)
      val good = read.filter(col("_corrupt_record").isNull)
      assert(good.count() == 2)
      assert(good.agg(sum(col("id"))).head().getLong(0) == 3L)
      // the corrupt lines are preserved verbatim for quarantine/debugging
      val bad = read.filter(col("_corrupt_record").isNotNull)
        .select(col("_corrupt_record")).collect().map(_.getString(0))
      assert(bad.length == 2)
      assert(bad.exists(_.contains("not json")))
      assert(bad.exists(_.contains("BROKEN")))
    } finally read.unpersist(blocking = false)
  }
}
