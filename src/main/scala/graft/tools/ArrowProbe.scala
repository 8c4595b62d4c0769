package graft.tools
import org.apache.spark.sql.SparkSession
/** One-off pyarrow-interop probe: write a small typed frame as Arrow
  * IPC for an external pyarrow read (and read back a pyarrow-written
  * file when given one). */
object ArrowProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq((1L, "a", Seq(0.5f, 1.5f)), (2L, "b", Seq(2.5f)))
      .toDF("id", "name", "vec")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(id * 1000003)"))
      .withColumn("amt", org.apache.spark.sql.functions.expr(
        "cast(id as decimal(14,4)) * cast('0.25' as decimal(4,2))"))
    graft.sources.ArrowIo.writeArrow(df, args(0), numFiles = 1)
    println("WROTE " + args(0))
    if (args.length > 1) {
      val back = graft.sources.ArrowIo.readArrow(spark, args(1))
      back.orderBy("id").collect().foreach(r => println("READ " + r))
    }
    spark.stop()
  }
}
