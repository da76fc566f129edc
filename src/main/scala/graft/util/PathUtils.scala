package graft.util

import scala.collection.immutable.ListMap

/** Host-side path bookkeeping for Hive-partitioned datasets.
  *
  * Behavioral contract derived from the reference's path handling
  * (/root/reference/polario/hive_dataset.py:25-41 relativization,
  * :104-132 partition path encode/decode, :51-70 fragment naming);
  * implementation is original Scala.
  */
object PathUtils {

  /** Make `location` relative to `baseLocation`, stripping
    * `possiblePrefix` (a scheme prefix like "s3://", or "") from both.
    *
    * Semantics per reference hive_dataset.py:25-41: strip the prefix
    * if present; if the base is relative and appears inside the
    * location, cut everything before it; strip leading slashes; then
    * strip the scheme-less base path segment.
    */
  def toRelativeLocationFrom(possiblePrefix: String, baseLocation: String, location: String): String = {
    var rel = if (location.startsWith(possiblePrefix) && possiblePrefix.nonEmpty)
      location.substring(possiblePrefix.length)
    else location

    if (!baseLocation.startsWith("/") && rel.contains(baseLocation))
      rel = rel.substring(rel.indexOf(baseLocation))

    rel = rel.dropWhile(_ == '/')
    val schemelessBase = baseLocation.drop(possiblePrefix.length).dropWhile(_ == '/')
    if (rel.startsWith(schemelessBase) && schemelessBase.nonEmpty)
      rel = rel.drop(schemelessBase.length + 1)
    rel
  }

  /** Encode ordered partition values as a relative path `k1=v1/k2=v2`.
    * (reference hive_dataset.py:130-132) */
  def partitionPath(values: Seq[(String, String)]): String =
    values.map { case (k, v) => s"$k=$v" }.mkString("/")

  /** Decode a relative partition path into ordered (key, value) pairs.
    * Throws IllegalArgumentException when a segment has no '='.
    * (reference hive_dataset.py:113-128) */
  def parsePartitionPath(relativePath: String): ListMap[String, String] = {
    val segments = relativePath.split("/").toSeq
    require(
      segments.forall(_.contains("=")),
      s"One or more partition path elements is missing an equal sign while parsing '$relativePath'")
    ListMap(segments.map { s =>
      val Array(k, v) = s.split("=", 2)
      k -> v
    }: _*)
  }

  /** First fragment file name in a partition: zero-padded index so
    * fragments order lexically (reference hive_dataset.py:51-62). */
  def firstFragmentName(): String = fragmentName(0)

  /** Successor fragment name: parse the index prefix, increment
    * (reference hive_dataset.py:64-70). */
  def nextFragmentName(current: String): String = {
    val idx = current.split("/").last.split("_").head.toInt
    fragmentName(idx + 1)
  }

  def fragmentName(idx: Int): String =
    f"$idx%06d_${java.util.UUID.randomUUID().toString.replace("-", "")}.parquet"

  /** Fragment index encoded in a fragment file name. */
  def fragmentIndex(name: String): Int =
    name.split("/").last.split("_").head.toInt

  private val FragmentPattern = """\d{6}_[0-9a-f]{32}\.parquet""".r

  /** Whether `name` is a reference-style fragment file name
    * (zero-padded index, uuid body — hive_dataset.py:51-62). */
  def isFragmentName(name: String): Boolean =
    FragmentPattern.matches(name.split("/").last)
}

/** `Option`-unwrap helper matching the reference's `unwrap`
  * (/root/reference/polario/__init__.py:12-26): fail loudly instead of
  * propagating emptiness. */
object Unwrap {
  def unwrap[T](opt: Option[T], msg: => String = "unwrap of empty Option"): T =
    opt.getOrElse(throw new IllegalStateException(msg))
}
