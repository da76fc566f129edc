package graft

import graft.sources.HiveDataset
import org.apache.spark.sql.functions._

/** Runnable end-to-end example: HiveDataset round-trip over the
  * sample lineitem table. `sbt "runMain graft.Example [sfDir] [out]"`.
  */
object Example {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-example").toString + "/lineitem_ds")
    implicit val spark = GraftSession.local()
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

    val ds = HiveDataset(out, Seq("l_returnflag", "l_linestatus"))
    ds.write(li)
    println(s"wrote ${li.count()} rows to $out")
    println(s"partitions discovered: ${ds.partitionPaths().mkString(", ")}")

    val scanned = ds.scan().getOrElse(sys.error("scan returned None"))
    println(s"scan row count: ${scanned.count()}; columns: ${scanned.columns.mkString(",")}")

    val part = ds.readPartition(Map("l_returnflag" -> "R", "l_linestatus" -> "F"))
      .getOrElse(sys.error("partition R/F missing"))
    println(s"partition R/F rows: ${part.count()}")

    ds.append(part.drop("l_returnflag", "l_linestatus")
      .withColumn("l_returnflag", lit("R")).withColumn("l_linestatus", lit("F")))
    println(s"after append, R/F rows: ${ds.readPartition(Map("l_returnflag" -> "R", "l_linestatus" -> "F")).get.count()}")

    ds.deletePartition(Map("l_returnflag" -> "R", "l_linestatus" -> "F"))
    println(s"after delete, R/F present: ${ds.readPartition(Map("l_returnflag" -> "R", "l_linestatus" -> "F")).nonEmpty}")
    println(s"remaining total: ${ds.scan().map(_.count()).getOrElse(0L)}")
    spark.stop()
  }
}
