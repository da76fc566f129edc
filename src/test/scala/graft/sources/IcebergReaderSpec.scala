package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The general HadoopCatalog v2 reader against a HAND-BUILT foreign
  * metadata tree (not this exporter's output): schema selection by
  * current-schema-id, multi-manifest lists, per-manifest partition
  * specs resolved by source-id, EXISTING/DELETED entry statuses,
  * native files that STORE their identity-partition column, and the
  * loud refusals (non-identity transforms, delete manifests,
  * row-level delete files, format-version 1). */
class IcebergReaderSpec extends SparkSpec {
  import spark.implicits._

  implicit private val s: org.apache.spark.sql.SparkSession = spark

  private def esc(x: String) = x.replace("\\", "\\\\").replace("\"", "\\\"")

  private val manifestSchemaJson =
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int","field-id":0},
      |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
      |{"name":"content","type":"int","field-id":134},
      |{"name":"file_path","type":"string","field-id":100},
      |{"name":"file_format","type":"string","field-id":101},
      |{"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[
      |{"name":"p_sanitized_0","type":["null","string"],"default":null,"field-id":1000}]}},
      |{"name":"record_count","type":"long","field-id":103},
      |{"name":"file_size_in_bytes","type":"long","field-id":104}
      |]}}]}""".stripMargin

  private val listSchemaJson =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"added_snapshot_id","type":"long","field-id":503}
      |]}""".stripMargin

  /** Build a foreign table: two parquet data files (that STORE the
    * partition column, as native Iceberg writers do), two manifests,
    * a stale decoy schema, spec-id 2, snapshot-id 777, hint v3. */
  private def buildForeign(table: String,
                           transform: String = "identity",
                           listContent: Int = 0,
                           dataContent: Int = 0,
                           formatVersion: Int = 2): Unit = {
    val fs = new Path(table).getFileSystem(
      spark.sessionState.newHadoopConf())
    def oneFile(dir: String, df: org.apache.spark.sql.DataFrame): String = {
      df.coalesce(1).write.parquet(s"$table/$dir")
      val f = new java.io.File(s"$table/$dir").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      f.toURI.toString
    }
    val f1 = oneFile("d1", Seq((1L, "x", "A"), (2L, "y", "A")).toDF("v", "s", "p"))
    val f2 = oneFile("d2", Seq((3L, "z", "B")).toDF("v", "s", "p"))
    val metaDir = new Path(table, "metadata")
    fs.mkdirs(metaDir)
    val mSchema = new org.apache.avro.Schema.Parser().parse(manifestSchemaJson)
    val dfSchema = mSchema.getField("data_file").schema()
    val partSchema = dfSchema.getField("partition").schema()
    def entry(status: Int, path: String, pv: String, n: Long) = {
      val part = new org.apache.avro.generic.GenericData.Record(partSchema)
      part.put(0, pv)
      val d = new org.apache.avro.generic.GenericData.Record(dfSchema)
      d.put("content", Int.box(dataContent))
      d.put("file_path", path)
      d.put("file_format", "PARQUET")
      d.put("partition", part)
      d.put("record_count", Long.box(n))
      d.put("file_size_in_bytes", Long.box(100L))
      val e = new org.apache.avro.generic.GenericData.Record(mSchema)
      e.put("status", Int.box(status))
      e.put("data_file", d)
      e
    }
    // manifest 1: one ADDED file + one DELETED tombstone (must skip);
    // manifest 2: one EXISTING file (must read)
    val m1 = new Path(metaDir, "m1.avro")
    val m2 = new Path(metaDir, "m2.avro")
    IcebergExport.writeAvro(fs, m1, mSchema, Map.empty, Seq(
      entry(1, f1, "A", 2L), entry(2, "file:/gone.parquet", "A", 9L)))
    IcebergExport.writeAvro(fs, m2, mSchema, Map.empty, Seq(
      entry(0, f2, "B", 1L)))
    val lSchema = new org.apache.avro.Schema.Parser().parse(listSchemaJson)
    def mfRec(p: Path) = {
      val r = new org.apache.avro.generic.GenericData.Record(lSchema)
      r.put("manifest_path", p.toUri.toString)
      r.put("manifest_length", Long.box(fs.getFileStatus(p).getLen))
      r.put("partition_spec_id", Int.box(2))
      r.put("content", Int.box(listContent))
      r.put("added_snapshot_id", Long.box(777L))
      r
    }
    val list = new Path(metaDir, "snap-777.avro")
    IcebergExport.writeAvro(fs, list, lSchema, Map.empty,
      Seq(mfRec(m1), mfRec(m2)))
    // schema-id 5 is current; the DECOY schema-id 0 has wrong types —
    // selection must go by current-schema-id, never by position.
    // spec-id 2's field name is SANITIZED ("p_sanitized_0"):
    // source-id 3 must resolve it back to column "p"
    IcebergExport.writeFile(fs, new Path(metaDir, "v3.metadata.json"),
      s"""{"format-version":$formatVersion,"table-uuid":"foreign",
         |"location":"${esc(table)}","last-sequence-number":9,
         |"last-updated-ms":1700000000000,"last-column-id":3,
         |"current-schema-id":5,"schemas":[
         |{"type":"struct","schema-id":0,"fields":[
         |{"id":1,"name":"WRONG","required":false,"type":"boolean"}]},
         |{"type":"struct","schema-id":5,"fields":[
         |{"id":1,"name":"v","required":false,"type":"long"},
         |{"id":2,"name":"s","required":false,"type":"string"},
         |{"id":3,"name":"p","required":false,"type":"string"}]}],
         |"default-spec-id":2,"partition-specs":[{"spec-id":2,"fields":[
         |{"name":"p_sanitized_0","transform":"$transform","source-id":3,"field-id":1000}]}],
         |"last-partition-id":1000,"default-sort-order-id":0,
         |"sort-orders":[{"order-id":0,"fields":[]}],"properties":{},
         |"current-snapshot-id":777,"snapshots":[
         |{"snapshot-id":777,"sequence-number":9,"timestamp-ms":1700000000000,
         |"schema-id":5,"manifest-list":"${esc(list.toUri.toString)}",
         |"summary":{"operation":"append"}}],
         |"snapshot-log":[],"metadata-log":[]}""".stripMargin.replace("\n", ""))
    IcebergExport.writeFile(fs, new Path(metaDir, "version-hint.text"), "3\n")
  }

  test("foreign v2 tree: schema by id, multi-manifest, statuses, source-id partition resolution") {
    withTempDir { dir =>
      val table = s"$dir/t"
      buildForeign(table)
      val got = IcebergReader.read(table).get
      assert(got.schema.fieldNames.toSeq == Seq("v", "s", "p"))
      val rows = got.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSet
      // ADDED + EXISTING read; DELETED skipped; partition literal
      // injected even though the native files also store column p
      assert(rows == Set((1L, "x", "A"), (2L, "y", "A"), (3L, "z", "B")))
      // hintless discovery: drop the hint, the highest v<N> resolves
      val fs = new Path(table).getFileSystem(
        spark.sessionState.newHadoopConf())
      fs.delete(new Path(table, "metadata/version-hint.text"), false)
      assert(IcebergReader.read(table).get.count() == 3L)
    }
  }

  test("empty foreign table (current-snapshot-id -1) resolves to an empty frame with the schema") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val fs = new Path(table).getFileSystem(
        spark.sessionState.newHadoopConf())
      fs.mkdirs(new Path(table, "metadata"))
      // a freshly created real Iceberg v2 table: no commits yet
      IcebergExport.writeFile(fs, new Path(table, "metadata/v1.metadata.json"),
        """{"format-version":2,"table-uuid":"empty","location":"x",
          |"last-sequence-number":0,"last-updated-ms":1,"last-column-id":1,
          |"current-schema-id":0,"schemas":[{"type":"struct","schema-id":0,
          |"fields":[{"id":1,"name":"v","required":false,"type":"long"}]}],
          |"default-spec-id":0,"partition-specs":[{"spec-id":0,"fields":[]}],
          |"last-partition-id":999,"default-sort-order-id":0,
          |"sort-orders":[{"order-id":0,"fields":[]}],"properties":{},
          |"current-snapshot-id":-1,"snapshots":[],
          |"snapshot-log":[],"metadata-log":[]}""".stripMargin.replace("\n", ""))
      IcebergExport.writeFile(fs, new Path(table, "metadata/version-hint.text"), "1\n")
      val got = IcebergReader.read(table).get
      assert(got.schema.fieldNames.toSeq == Seq("v"))
      assert(got.count() == 0L)
    }
  }

  test("manifest under an older SUBSET partition spec injects null for the newer column") {
    withTempDir { dir =>
      val table = s"$dir/t"
      val fs = new Path(table).getFileSystem(
        spark.sessionState.newHadoopConf())
      import spark.implicits._
      // pre-evolution file: written before partition field p existed
      Seq((1L, "x")).toDF("v", "s").coalesce(1).write.parquet(s"$table/d0")
      val f0 = new java.io.File(s"$table/d0").listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toURI.toString
      fs.mkdirs(new Path(table, "metadata"))
      // manifest under spec-0 (NO partition fields)
      val mSchema = new org.apache.avro.Schema.Parser().parse(
        """{"type":"record","name":"manifest_entry","fields":[
          |{"name":"status","type":"int","field-id":0},
          |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
          |{"name":"content","type":"int","field-id":134},
          |{"name":"file_path","type":"string","field-id":100},
          |{"name":"file_format","type":"string","field-id":101},
          |{"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[]}},
          |{"name":"record_count","type":"long","field-id":103},
          |{"name":"file_size_in_bytes","type":"long","field-id":104}
          |]}}]}""".stripMargin)
      val dfS = mSchema.getField("data_file").schema()
      val d = new org.apache.avro.generic.GenericData.Record(dfS)
      d.put("content", Int.box(0)); d.put("file_path", f0)
      d.put("file_format", "PARQUET")
      d.put("partition", new org.apache.avro.generic.GenericData.Record(
        dfS.getField("partition").schema()))
      d.put("record_count", Long.box(1L))
      d.put("file_size_in_bytes", Long.box(100L))
      val e = new org.apache.avro.generic.GenericData.Record(mSchema)
      e.put("status", Int.box(1)); e.put("data_file", d)
      val m = new Path(table, "metadata/m0.avro")
      IcebergExport.writeAvro(fs, m, mSchema, Map.empty, Seq(e))
      val lSchema = new org.apache.avro.Schema.Parser().parse(listSchemaJson)
      val r = new org.apache.avro.generic.GenericData.Record(lSchema)
      r.put("manifest_path", m.toUri.toString)
      r.put("manifest_length", Long.box(fs.getFileStatus(m).getLen))
      r.put("partition_spec_id", Int.box(0))
      r.put("content", Int.box(0))
      r.put("added_snapshot_id", Long.box(5L))
      val list = new Path(table, "metadata/snap-5.avro")
      IcebergExport.writeAvro(fs, list, lSchema, Map.empty, Seq(r))
      IcebergExport.writeFile(fs, new Path(table, "metadata/v2.metadata.json"),
        s"""{"format-version":2,"table-uuid":"evo","location":"${esc(table)}",
           |"last-sequence-number":1,"last-updated-ms":1,"last-column-id":3,
           |"current-schema-id":0,"schemas":[{"type":"struct","schema-id":0,"fields":[
           |{"id":1,"name":"v","required":false,"type":"long"},
           |{"id":2,"name":"s","required":false,"type":"string"},
           |{"id":3,"name":"p","required":false,"type":"string"}]}],
           |"default-spec-id":1,"partition-specs":[
           |{"spec-id":0,"fields":[]},
           |{"spec-id":1,"fields":[{"name":"p","transform":"identity","source-id":3,"field-id":1000}]}],
           |"last-partition-id":1000,"default-sort-order-id":0,
           |"sort-orders":[{"order-id":0,"fields":[]}],"properties":{},
           |"current-snapshot-id":5,"snapshots":[{"snapshot-id":5,
           |"sequence-number":1,"timestamp-ms":1,"schema-id":0,
           |"manifest-list":"${esc(list.toUri.toString)}",
           |"summary":{"operation":"append"}}],
           |"snapshot-log":[],"metadata-log":[]}""".stripMargin.replace("\n", ""))
      IcebergExport.writeFile(fs, new Path(table, "metadata/version-hint.text"), "2\n")
      val rows = IcebergReader.read(table).get.collect()
      assert(rows.length == 1)
      assert(rows.head.getLong(0) == 1L && rows.head.getString(1) == "x")
      assert(rows.head.isNullAt(2),
        "a column absent from the file's older spec must inject null")
    }
  }

  test("foreign refusals are loud: transforms, delete manifests, delete files, format versions") {
    withTempDir { dir =>
      buildForeign(s"$dir/tr", transform = "bucket[4]")
      val e1 = intercept[IllegalArgumentException](
        IcebergReader.read(s"$dir/tr").get.collect())
      assert(e1.getMessage.contains("transform"))
      buildForeign(s"$dir/dm", listContent = 1)
      val e2 = intercept[IllegalArgumentException](
        IcebergReader.read(s"$dir/dm").get.collect())
      assert(e2.getMessage.contains("delete manifests"))
      buildForeign(s"$dir/df", dataContent = 1)
      val e3 = intercept[IllegalArgumentException](
        IcebergReader.read(s"$dir/df").get.collect())
      assert(e3.getMessage.contains("delete files"))
      buildForeign(s"$dir/v1", formatVersion = 1)
      val e4 = intercept[IllegalArgumentException](
        IcebergReader.read(s"$dir/v1").get.collect())
      assert(e4.getMessage.contains("format-version"))
      // no metadata at all → None, not an error
      assert(IcebergReader.read(s"$dir/absent").isEmpty)
    }
  }
}
