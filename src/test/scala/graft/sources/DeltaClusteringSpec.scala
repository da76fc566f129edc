package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Liquid clustering (`clustering` writer feature + `delta.clustering`
  * domain metadata): a foreign clustered table is writable (appends
  * are layout-advisory per the protocol), `optimizeClustered` honors
  * the domain's clustering columns with the z-order rewrite, and the
  * domain survives every commit by replay. */
class DeltaClusteringSpec extends SparkSpec {
  import spark.implicits._

  implicit private val s: org.apache.spark.sql.SparkSession = spark

  private def esc(x: String): String =
    x.replace("\\", "\\\\").replace("\"", "\\\"")

  /** A foreign clustered table: one seed file, clustering on (a, b). */
  private def buildClustered(table: String, cols: String = """["a"],["b"]""")
      : Unit = {
    val frag = Files.createTempDirectory("cl-frag")
    (0L until 64L).map(i => (i % 8, i / 8)).toDF("a", "b")
      .coalesce(1).write.mode("overwrite").parquet(frag.toString)
    val part = Files.list(frag)
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.createDirectories(Paths.get(table))
    Files.copy(part, Paths.get(table, "f0.parquet"))
    val schema = StructType(Seq(StructField("a", LongType),
      StructField("b", LongType)))
    val lines = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["clustering","domainMetadata"]}}""",
      s"""{"metaData":{"id":"cl","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${esc(schema.json)}","partitionColumns":[],""" +
        s""""configuration":{},"createdTime":1700000000000}}""",
      s"""{"add":{"path":"f0.parquet","partitionValues":{},""" +
        s""""size":${Paths.get(table, "f0.parquet").toFile.length},""" +
        s""""modificationTime":1700000000000,"dataChange":true}}""",
      s"""{"domainMetadata":{"domain":"delta.clustering",""" +
        s""""configuration":"${esc(s"""{"clusteringColumns":[$cols]}""")}",""" +
        """"removed":false}}""")
    val logDir = Paths.get(table, "_delta_log")
    Files.createDirectories(logDir)
    Files.write(logDir.resolve("%020d.json".format(0)),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
  }

  test("a clustered foreign table is writable; optimize honors the domain and preserves it") {
    withTempDir { dir =>
      val table = s"$dir/t"
      buildClustered(table)
      val ds = new DeltaDataset(table)
      // the clustering feature no longer refuses writes
      ds.append(Seq((100L, 100L), (101L, 101L)).toDF("a", "b"))      // v1
      assert(DeltaReader.scan(table).get.count() == 66L)
      // OPTIMIZE picks the clustering columns up from the domain
      val v = ds.optimizeClustered(targetFileBytes = 64L * 1024 * 1024)
      assert(v == 2L, "optimizeClustered must commit a rewrite")
      val snap = DeltaReader.snapshot(table).get
      assert(snap.domainMetadata.get("delta.clustering")
        .exists(_.contains("clusteringColumns")),
        "the clustering domain must survive the rewrite commit")
      // logically identical table after the rewrite
      val out = DeltaReader.scan(table).get.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out.size == 66 && out.contains((100L, 100L)))
      // the rewrite actually clustered: with one landed file the scan
      // is trivially tight; assert the rewrite consolidated the files
      assert(snap.files.size < 3,
        s"rewrite should consolidate small files, got ${snap.files.size}")
    }
  }

  test("clusteringColumnsOf resolves physical names; refusal contracts hold") {
    withTempDir { dir =>
      // garbage domain refuses loudly
      val t1 = s"$dir/t1"
      buildClustered(t1)
      val log = Paths.get(t1, "_delta_log/%020d.json".format(1))
      Files.write(log,
        ("""{"domainMetadata":{"domain":"delta.clustering",""" +
          """"configuration":"not json","removed":false}}""" + "\n")
          .getBytes("UTF-8"))
      val e1 = intercept[IllegalArgumentException] {
        DeltaWriter.optimizeClustered(t1)
      }
      assert(e1.getMessage.contains("unreadable"))
      // nested clustering path refuses loudly
      val t2 = s"$dir/t2"
      buildClustered(t2, cols = """["a","x"]""")
      val e2 = intercept[IllegalArgumentException] {
        DeltaWriter.optimizeClustered(t2)
      }
      assert(e2.getMessage.contains("nested clustering"))
      // a table without the domain refuses optimizeClustered (use
      // zorder directly)
      val t3 = s"$dir/t3"
      new DeltaDataset(t3).write(Seq((1L, 2L)).toDF("a", "b"))
      val e3 = intercept[IllegalArgumentException] {
        DeltaWriter.optimizeClustered(t3)
      }
      assert(e3.getMessage.contains("no"))
    }
  }
}
