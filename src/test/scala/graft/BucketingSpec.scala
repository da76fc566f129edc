package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._

/** Bucketed-table co-location: the join between two tables bucketed on
  * their join keys plans with NO Exchange (shuffle paid at write time,
  * not per query). */
class BucketingSpec extends SparkSpec {

  test("identically-bucketed tables join with zero exchanges and zero sorts") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_name")

    Bucketing.writeBucketed(orders, "b_orders", "o_custkey", 8)
    Bucketing.writeBucketed(customer, "b_customer", "c_custkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    // Sorted-bucket scans only report their ordering behind this flag
    // (safe here: writeBucketed guarantees one file per bucket).
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val j = Bucketing.coLocatedJoin(spark, "b_orders", "b_customer",
        "o_custkey", "c_custkey")
      assert(j.count() == orders.count()) // every order has its customer

      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; plan:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join; plan:\n$plan")
      // per-bucket sortBy makes even the sort unnecessary
      assert(!plan.contains("+- Sort "), s"bucketed+sorted join must not re-sort; plan:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    }
  }
}
