package graft.tools
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTest.session
    val p = graft.SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    p.linesIterator.filter(l => l.contains("Join") || l.contains("InMemory"))
      .foreach(l => println("[plan] " + l.trim.take(160)))
    spark.stop()
  }
}
