package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** `typeWidening` reader tolerance: a table whose schema was widened
  * (int → long / float → double; old files still store the narrow
  * type) reads by casting every file to the LATEST schema — Spark's
  * parquet reader applies the widening promotions natively. Writes
  * keep refusing: the feature is not in SupportedWriterFeatures. */
class DeltaTypeWideningSpec extends SparkSpec {
  import spark.implicits._

  implicit private val s: org.apache.spark.sql.SparkSession = spark

  private def esc(x: String): String =
    x.replace("\\", "\\\\").replace("\"", "\\\"")

  /** A widened fixture: f0 stores (v: int32, x: float); the table
    * schema declares (v: long, x: double) with delta.typeChanges. */
  private def buildWidened(table: String): Unit = {
    val frag = Files.createTempDirectory("tw-frag")
    Seq((1, 1.5f), (2, 2.5f), (3, 3.5f)).toDF("v", "x")
      .coalesce(1).write.mode("overwrite").parquet(frag.toString)
    val part = Files.list(frag)
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.createDirectories(Paths.get(table))
    Files.copy(part, Paths.get(table, "f0.parquet"))
    val tc = (from: String, to: String) => Metadata.fromJson(
      s"""{"delta.typeChanges":[{"fromType":"$from","toType":"$to",
         |"tableVersion":1}]}""".stripMargin)
    val schema = StructType(Seq(
      StructField("v", LongType, nullable = true, tc("integer", "long")),
      StructField("x", DoubleType, nullable = true, tc("float", "double"))))
    val lines = Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["typeWidening"],""" +
        """"writerFeatures":["typeWidening"]}}""",
      s"""{"metaData":{"id":"tw","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${esc(schema.json)}","partitionColumns":[],""" +
        s""""configuration":{},"createdTime":1700000000000}}""",
      s"""{"add":{"path":"f0.parquet","partitionValues":{},""" +
        s""""size":${Paths.get(table, "f0.parquet").toFile.length},""" +
        s""""modificationTime":1700000000000,"dataChange":true}}""")
    val logDir = Paths.get(table, "_delta_log")
    Files.createDirectories(logDir)
    Files.write(logDir.resolve("%020d.json".format(0)),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
  }

  test("narrow old files read under the widened schema; writes refuse") {
    withTempDir { dir =>
      val table = s"$dir/t"
      buildWidened(table)
      val scan = DeltaReader.scan(table).get
      assert(scan.schema("v").dataType == LongType &&
        scan.schema("x").dataType == DoubleType,
        "the scan must present the LATEST (widened) schema")
      val rows = scan.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(rows == Set((1L, 1.5), (2L, 2.5), (3L, 3.5)),
        s"int32/float files must upcast to long/double: $rows")
      // filters over the widened column still work (pushdown casts)
      assert(scan.where(col("v") >= 2L).count() == 2L)
      // writer feature stays refused — loud, not corrupting
      val e = intercept[IllegalArgumentException] {
        new DeltaDataset(table).append(Seq((9L, 9.0)).toDF("v", "x"))
      }
      assert(e.getMessage.contains("typeWidening"))
    }
  }
}
