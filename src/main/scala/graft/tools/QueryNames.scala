package graft.tools

/** Print every registered query name (sorted) — the generator for
  * SURVEY.md Appendix A and the input of SurveyParitySpec's reverse
  * check. Driver-side bookkeeping, no Spark session. */
object QueryNames {
  def main(args: Array[String]): Unit = {
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach(println)
    System.err.println(s"TOTAL ${graft.SparkEntry.queries.size}")
  }
}
