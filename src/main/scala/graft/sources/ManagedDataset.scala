package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StringType

/** Parquet-backed stand-in for the reference's Delta backend.
  *
  * The reference's DeltaDataset (/root/reference/polario/
  * delta_dataset.py:10-62) exposes only overwrite/append writes
  * partitioned by string columns, a partition-filtered read, and a
  * scan that returns None for a missing table — all observable
  * behavior expressible on plain partitioned parquet. No Delta jars
  * ship in this environment, so this class reproduces that observable
  * surface with Spark-native partitioned parquet + dynamic partition
  * overwrite. Divergence (documented): no transaction log, no time
  * travel — neither is reachable through the reference's API.
  *
  * Unlike [[HiveDataset]] it does not reorder columns or cap fragment
  * rows: layout is whatever Spark's writer produces, as Delta's would
  * be.
  */
case class ManagedDataset(
    url: String,
    partitionColumns: Seq[String] = Nil)(implicit spark: SparkSession)
  extends DatasetLike {

  private val cleanUrl = url.stripSuffix("/")
  @transient private val fs =
    new Path(cleanUrl).getFileSystem(spark.sessionState.newHadoopConf())
  private val qualifiedBase = fs.makeQualified(new Path(cleanUrl))

  override def write(df: DataFrame): Unit = writeMode(df, "overwrite")
  override def append(df: DataFrame): Unit = writeMode(df, "append")

  private def writeMode(df: DataFrame, mode: String): Unit = {
    validate(df)
    val writer = df.write.mode(mode).option("partitionOverwriteMode", "dynamic")
    (if (partitionColumns.nonEmpty) writer.partitionBy(partitionColumns: _*) else writer)
      .parquet(cleanUrl)
  }

  private def validate(df: DataFrame): Unit = {
    val cols = df.columns.toSet
    require(partitionColumns.forall(cols.contains),
      s"Partition columns $partitionColumns not found in ${df.columns.toSeq}")
    require((cols -- partitionColumns).nonEmpty,
      "Dataframe only contains partition columns")
    partitionColumns.foreach { c =>
      require(df.schema(c).dataType == StringType,
        s"Partition column '$c' must be a string")
    }
  }

  /** Scan or None for a missing/empty table — the reference catches
    * TableNotFoundError (delta_dataset.py:56-62); here the equivalent
    * is an existence pre-check. */
  override def scan(): Option[DataFrame] = {
    if (!fs.exists(qualifiedBase)) return None
    val hasData = {
      val it = fs.listFiles(qualifiedBase, true)
      var found = false
      while (!found && it.hasNext)
        if (it.next().getPath.getName.endsWith(".parquet")) found = true
      found
    }
    if (!hasData) None
    else {
      val df = spark.read.option("mergeSchema", "true")
        .option("basePath", qualifiedBase.toString).parquet(cleanUrl)
      Some(partitionColumns.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(StringType))))
    }
  }

  /** Partition-filtered read (delta_dataset.py:41-54): a filter on
    * partition columns — Catalyst static partition pruning turns it
    * into a single-directory scan. */
  override def readPartition(values: Map[String, String]): Option[DataFrame] = {
    require(values.keySet == partitionColumns.toSet,
      s"Partition column value keys ${values.keySet} do not match partition columns $partitionColumns")
    scan().map { df =>
      values.foldLeft(df) { case (d, (k, v)) => d.filter(col(k) === v) }
    }.filter(_ => {
      val dir = new Path(qualifiedBase, graft.util.PathUtils.partitionPath(partitionColumns.map(k => k -> values(k))))
      fs.exists(dir)
    })
  }
}
