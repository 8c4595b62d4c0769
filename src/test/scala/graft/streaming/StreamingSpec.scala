package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.queries.Tables

/** Batch-equivalence tests for the Structured Streaming operators
  * (SURVEY.md §7.4 risk 7): AvailableNow over the static events parquet
  * must equal the batch formulation once all data is processed. */
class StreamingSpec extends SparkSpec {

  test("tumbling streaming agg equals batch window agg") {
    val streamed = EventStreams.runAvailableNow(
      spark, s"$sfDir/events.parquet",
      df => EventStreams.tumblingAgg(df), "spec_tumbling")
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_v"))
      .select(col("w.start").as("ws"), col("event_type"), col("cnt"), col("sum_v"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("flatMapGroupsWithState running totals equal batch groupBy at the end") {
    // update-mode memory sink keeps every emitted row; the LAST row per
    // user is the final state — compare that against the batch aggregate
    val events = Tables.load(spark, sfDir, "events")
    val staged = s"/root/repo/target/tmp/spec_stateful_${System.nanoTime()}"
    events.write.mode("overwrite").parquet(staged)
    val stream = spark.readStream.schema(events.schema).parquet(staged)
    val q = EventStreams.statefulUserTotals(stream).writeStream
      .format("memory").queryName("spec_stateful")
      .outputMode("update")
      .option("checkpointLocation", s"$staged/_ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // one AvailableNow run may process several micro-batches; the memory
    // sink appends per batch — keep the last emission per user
    val finals = spark.table("spec_stateful")
      .withColumn("rn", monotonically_increasing_id())
      .groupBy(col("user_id"))
      .agg(max(struct(col("rn"), col("n_events"), col("sum_value"))).as("s"))
      .select(col("user_id"), col("s.n_events").as("n_events"),
        round(col("s.sum_value"), 2).as("sum_value"))
    val batch = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
    assert(finals.exceptAll(batch).isEmpty && batch.exceptAll(finals).isEmpty)
  }
}
