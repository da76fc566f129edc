package graft
import org.apache.spark.sql.SparkSession

/** Dev smoke for the driver's t1 contract: `entry` on sf0.001 must
  * return rows > 0. */
object EntryCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.catalyst.GraftFunctions.register(spark)
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n")
    assert(n > 0, "entry must return rows")
    spark.stop()
  }
}
