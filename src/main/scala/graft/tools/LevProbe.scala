package graft.tools
import org.apache.spark.sql.SparkSession
object LevProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(("kitten", "sitting", 3), ("abc", "xyz", 1)).toDF("a", "b", "t")
    try {
      df.selectExpr("levenshtein(a, b, t) as d").show()
      println("[levprobe] column threshold OK")
    } catch { case e: Throwable => println("[levprobe] column threshold FAILED: " + e.getMessage.take(200)) }
    try {
      df.selectExpr("levenshtein(a, b, 3) as d").show()
      println("[levprobe] literal threshold OK")
    } catch { case e: Throwable => println("[levprobe] literal FAILED: " + e.getMessage.take(200)) }
    spark.stop()
  }
}
