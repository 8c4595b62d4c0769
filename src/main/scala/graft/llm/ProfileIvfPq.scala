package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the IVF-PQ phases (not part of the surface). */
object ProfileIvfPq {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.queries.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val queries = base.filter(col("vec_id") < 10)
    val corpus = base.unionByName(queries.select(
      (col("vec_id") + 100000).as("vec_id"), col("embedding")))
    corpus.write.format("noop").mode("overwrite").save() // warm
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      t("trainCentroids(nlist=16, iters=3)") {
        Clustering.trainCentroids(corpus, "vec_id", "embedding", 16, 3)
      }
      t("trainSubspaceCodebooks(m=8, ksub=16, iters=3)") {
        Clustering.trainSubspaceCodebooks(
          corpus, "vec_id", "embedding", 8, 8, 16, 3)
      }
      t("full ivfPqTopK") {
        Similarity.ivfPqTopK(corpus, queries,
            k = 5, nlist = 16, nprobe = 4, m = 8, ksub = 16, refine = 4)
          .write.format("noop").mode("overwrite").save()
      }
      Caches.release(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
