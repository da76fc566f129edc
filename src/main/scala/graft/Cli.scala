package graft

import graft.operators.Inspect
import java.nio.file.{Files, Paths}

/** Thin CLI mirroring the reference's verbs
  * (/root/reference/polario/main.py:25-48): `graft.Cli <verb> PATH...`
  * with verbs show | schema | json_head | jsonl | concat_csv |
  * write_csv. Rejects directories for file verbs (main.py:65-68).
  */
object Cli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.Cli <show|schema|json_head|jsonl|concat_csv|write_csv> PATH...")
    val verb = args.head
    val paths = args.tail.toSeq
    val spark = GraftSession.local()
    try {
      verb match {
        case "concat_csv" =>
          val out = paths.head.replaceAll("\\.csv$", "") + ".parquet"
          Inspect.concatCsvToParquet(spark, paths, out)
        case _ =>
          paths.foreach { p =>
            require(!Files.isDirectory(Paths.get(p)), s"$p is a directory, not a file")
            val df = spark.read.parquet(p)
            verb match {
              case "show"      => Inspect.show(df)
              case "schema"    => println(Inspect.schemaString(df))
              case "json_head" => Inspect.jsonHead(df).foreach(println)
              case "jsonl"     =>
                // stream partitions through the driver one at a time —
                // same output order as collect(), never the whole table
                // materialized driver-side
                Inspect.jsonl(df).toLocalIterator()
                  .forEachRemaining(line => println(line))
              case "write_csv" => Inspect.writeCsv(df, p.replaceAll("\\.parquet$", "") + ".csv")
              case other       => sys.error(s"unknown verb $other")
            }
          }
      }
    } finally spark.stop()
  }
}
