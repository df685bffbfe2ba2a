package graft.tools
import org.apache.spark.sql.SparkSession
object TsProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = s.read.parquet("/root/testdata/sf0.01/events.parquet").limit(3)
      .select("event_id","ts")
    df.write.mode("overwrite").option("header","true")
      .option("timestampFormat","yyyy-MM-dd HH:mm:ss.SSSSSS").csv("/tmp/tsprobe_csv")
    df.write.mode("overwrite")
      .option("timestampFormat","yyyy-MM-dd HH:mm:ss.SSSSSS").json("/tmp/tsprobe_json")
    s.stop()
  }
}
