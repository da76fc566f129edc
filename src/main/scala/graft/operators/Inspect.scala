package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, count, expr, lit, md5, row_number, when}

/** Parquet/CSV inspection & conversion verbs.
  *
  * The reference's CLI surface (/root/reference/polario/main.py:25-85):
  * show / schema / json_head / jsonl / concat_csv / write_csv, exposed
  * here as library functions plus a thin `main` in [[graft.Cli]].
  */
object Inspect {

  /** `show`: human-readable frame repr (main.py:70-71). */
  def show(df: DataFrame): Unit = df.show(20, truncate = false)

  /** `schema` (main.py:72-73). */
  def schemaString(df: DataFrame): String = df.schema.treeString

  /** `json_head`: first 5 rows as JSON (main.py:74-75). Driver-side by
    * design — it is an inspection verb, bounded at 5 rows. */
  def jsonHead(df: DataFrame, n: Int = 5): Seq[String] =
    df.limit(n).toJSON.collect().toSeq

  /** `jsonl`: the whole frame as JSON lines (main.py:76-79) — returns
    * the lazy Dataset so callers can write it distributed instead of
    * collecting. */
  def jsonl(df: DataFrame): org.apache.spark.sql.Dataset[String] = df.toJSON

  /** `concat_csv`: union CSVs with *no* schema inference — every
    * column is a string (main.py:50-62, infer_schema_length=0) — and
    * write parquet. Refuses to overwrite. */
  def readCsvAllString(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .csv(paths: _*)

  def concatCsvToParquet(spark: SparkSession, csvPaths: Seq[String], outPath: String): Unit = {
    requireAbsent(spark, outPath)
    readCsvAllString(spark, csvPaths).write.mode(SaveMode.ErrorIfExists).parquet(outPath)
  }

  /** `write_csv`: parquet → CSV, skip if the target exists
    * (main.py:80-85). */
  def writeCsv(df: DataFrame, outPath: String): Unit = {
    val spark = df.sparkSession
    if (!exists(spark, outPath))
      df.write.option("header", "true").mode(SaveMode.ErrorIfExists).csv(outPath)
  }

  /** Snapshot diff between two dataset versions keyed by `idCol`:
    * one row per id with `status` ∈ added | removed | changed |
    * unchanged (content compared by md5 of `contentCol`). The
    * maintenance probe a curation iteration runs before promoting a
    * rebuilt corpus — "what did this pipeline change?".
    *
    * Scale shape: both sides reduce to `(id, digest)` projections
    * before the single full-outer equi-join on the id — the join
    * shuffles 2×(8-byte id + 32-byte digest) per row, never the
    * payloads; at 100 TB both sides would be bucketed by id and the
    * join co-located. */
  def diffSnapshots(before: DataFrame, after: DataFrame,
                    idCol: String, contentCol: String): DataFrame = {
    // presence flags, not digest nullness: a null-content row still
    // EXISTS on its side (its digest is null) and must not read as
    // added/removed; digests compare null-safely for the same reason
    val b = before.select(col(idCol).as("__id"),
      md5(col(contentCol)).as("__bd"), lit(1).as("__bp"))
    val a = after.select(col(idCol).as("__id"),
      md5(col(contentCol)).as("__ad"), lit(1).as("__ap"))
    b.join(a, Seq("__id"), "full_outer")
      .select(col("__id").as(idCol),
        when(col("__bp").isNull, lit("added"))
          .when(col("__ap").isNull, lit("removed"))
          .when(col("__bd") <=> col("__ad"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Apply an ordered CDC change log to a snapshot — the lakehouse
    * MERGE verb a plain upsert can't express: the log carries
    * insert/update ('U') and delete ('D') operations per key with a
    * sequence column; only each key's LATEST operation decides its
    * fate (U → the log row's payload wins, D → the key disappears),
    * keys absent from the log pass through untouched. Change rows
    * must carry the snapshot's payload columns.
    *
    * Determinism: the latest-op choice orders by `(seqCol DESC)` with
    * the op as tiebreak — equal sequence numbers for one key are a
    * FEED BUG, surfaced deterministically (D sorts before U, so
    * deletes win ties) rather than racily.
    *
    * Scale shape: one key-partitioned window over the (usually small)
    * change log + one key equi-join against the snapshot (broadcast
    * when the log is batch-sized, the common case); the snapshot
    * never shuffles on the payload. */
  def applyCdc(snapshot: DataFrame, changes: DataFrame, keyCol: String,
               seqCol: String, opCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc, col(opCol))
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
    val payloadCols = snapshot.columns
    val kept = snapshot.join(
      latest.select(col(keyCol)), Seq(keyCol), "left_anti")
    val applied = latest.where(col(opCol) =!= "D")
      .select(payloadCols.map(col): _*)
    kept.unionByName(applied)
  }

  /** Content-addressed partition fingerprints: per group, the row
    * count and the XOR of per-row content hashes — an
    * ORDER-INDEPENDENT digest (xor is commutative), so it is stable
    * under any partitioning/shuffle and two corpus versions can be
    * compared partition-by-partition without moving data ("which
    * partitions changed" before [[diffSnapshots]] tells you which
    * ROWS). Any single-row change flips the digest; the documented
    * blind spot is even-multiplicity duplicate swaps (a⊕a = 0) —
    * the `(n_rows, digest)` PAIR catches additions/removals, and
    * row-level diff confirms. One aggregation, map-side combined. */
  def partitionDigests(df: DataFrame, groupCol: String,
                       contentCol: String): DataFrame = {
    import graft.functions.TextHash.{spark => H}
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).cast("bigint").as("n_rows"),
        expr(s"bit_xor(${H.rollingHash(contentCol)})").cast("bigint").as("digest"))
      .orderBy(groupCol)
  }

  /** Read a JSON-lines file the way [[jsonl]] writes it — the source
    * side of the reference's JSON surface (main.py's jsonl sink had
    * no documented reader; training corpora ship as jsonl constantly,
    * so the ingest path is first-class here). `schema` pins the
    * column types (ALWAYS pass it at scale: schema inference is a
    * full extra pass over the data); `None` infers for ad-hoc use. */
  def readJsonl(spark: SparkSession, path: String,
                schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** JSONL ingest with a bad-row SIDE CHANNEL — the quarantine
    * pattern every production feed needs: parse failures don't abort
    * the load and don't vanish, they land in a second frame for
    * triage. PERMISSIVE mode with an explicit corrupt-record column;
    * the raw read is checkpointed first (Spark refuses filters that
    * reference only the internal corrupt column on a lazy scan).
    * Returns `(good, quarantine)` — quarantine rows carry the
    * verbatim offending line as `raw`. */
  def readJsonlQuarantined(spark: SparkSession, path: String,
                           schema: org.apache.spark.sql.types.StructType)
      : (DataFrame, DataFrame) = {
    val withCorrupt = schema.add("_corrupt_record",
      org.apache.spark.sql.types.StringType)
    val raw = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .localCheckpoint()
    (raw.where(col("_corrupt_record").isNull).drop("_corrupt_record"),
      raw.where(col("_corrupt_record").isNotNull)
        .select(col("_corrupt_record").as("raw")))
  }

  /** Schema drift between two frames: one row per column name that
    * appears in either schema, with `status` added / removed /
    * retyped / unchanged and the DDL type on each side. The
    * metadata-level companion of [[diffSnapshots]] — run it FIRST
    * when promoting a rebuilt corpus: a silent retype (int → string)
    * passes row-level digests built on casts but breaks readers.
    * Pure driver-side metadata (schemas, not data — no job runs);
    * result returned as a frame so it composes with expectation
    * gates. */
  def diffSchemas(before: DataFrame, after: DataFrame): DataFrame = {
    val spark = before.sparkSession
    import spark.implicits._
    val b = before.schema.map(f => f.name -> f.dataType.sql).toMap
    val a = after.schema.map(f => f.name -> f.dataType.sql).toMap
    (b.keySet ++ a.keySet).toSeq.sorted.map { c =>
      val status = (b.get(c), a.get(c)) match {
        case (None, Some(_)) => "added"
        case (Some(_), None) => "removed"
        case (Some(x), Some(y)) if x == y => "unchanged"
        case _ => "retyped"
      }
      (c, status, b.get(c).orNull, a.get(c).orNull)
    }.toDF("column_name", "status", "before_type", "after_type")
  }

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  private def requireAbsent(spark: SparkSession, path: String): Unit =
    require(!exists(spark, path), s"Refusing to overwrite existing path $path")
}
