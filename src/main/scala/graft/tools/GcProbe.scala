package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object GcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    var refDs: java.lang.ref.WeakReference[AnyRef] = null
    var refPlain: java.lang.ref.WeakReference[AnyRef] = null
    def mk(): Unit = {
      val src = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f))).toDF("id", "values")
      val tgt = Seq((9L, Array(1f, 0.1f))).toDF("id", "values")
      val r = graft.operators.Mining.marginPairs(spark, src, tgt, k = 1)
      r.count()
      refDs = new java.lang.ref.WeakReference[AnyRef](r)
      val o = new Object
      refPlain = new java.lang.ref.WeakReference[AnyRef](o)
    }
    mk()
    for (i <- 1 to 20 if refDs.get() != null) { System.gc(); Thread.sleep(200) }
    println(s"plain collected: ${refPlain.get() == null}")
    println(s"dataset collected: ${refDs.get() == null}")
    println(s"persistent rdds: ${spark.sparkContext.getPersistentRDDs.size}")
    spark.stop()
  }
}
