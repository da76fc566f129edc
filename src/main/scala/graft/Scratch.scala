package graft

/** Dev scratch main — ad-hoc experiments only; not part of the
  * library surface. See Verify/Bench for the driver entry points and
  * tools/check_correctness.py for the local oracle harness. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    SparkEntry.entry(spark).show()
    spark.stop()
  }
}
