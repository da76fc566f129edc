package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Shared-session ScalaTest base. One session per suite. */
trait SparkSpec extends AnyFunSuite {
  implicit lazy val spark: SparkSession = GraftSession.local(4)

  def withTempDir[T](f: String => T): T = {
    val dir = Files.createTempDirectory("graft-test").toFile
    try f(dir.getAbsolutePath)
    finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  /** Canonical-form equality, mirroring the reference's assert_equal
    * (/root/reference/tests/test_hive_dataset.py:15-40): same column
    * set, same schema, same rows ignoring row and column order. */
  def assertSameData(actual: DataFrame, expected: DataFrame): Unit = {
    assert(actual.columns.sorted.toSeq == expected.columns.sorted.toSeq,
      s"column sets differ: ${actual.columns.toSeq} vs ${expected.columns.toSeq}")
    val cols = actual.columns.sorted.toSeq
    def canon(df: DataFrame): Seq[Row] =
      df.select(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect().toSeq.sortBy(_.toString)
    val (a, e) = (canon(actual), canon(expected))
    assert(a == e, s"data differs:\n  actual:   $a\n  expected: $e")
  }
}
