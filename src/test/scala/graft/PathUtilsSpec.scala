package graft

import graft.util.{PathUtils, Unwrap}
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's path-relativization table test
  * (/root/reference/tests/test_hive_dataset.py:200-227) plus partition
  * path encode/decode and fragment naming contracts. */
class PathUtilsSpec extends AnyFunSuite {
  import PathUtils._

  test("to_relative_location_from matches the reference's 8-case table") {
    val burl = "s3://a/b"
    assert(toRelativeLocationFrom("s3://", burl, "s3://a/b/some_type=1") == "some_type=1")
    assert(toRelativeLocationFrom("s3://", burl, "/a/b/2021/01/01") == "2021/01/01")
    assert(toRelativeLocationFrom("s3://", burl, "a/b/2021/01/01.hello") == "2021/01/01.hello")
    assert(toRelativeLocationFrom("s3://", burl, "a/b/2021/01/") == "2021/01/")
    assert(toRelativeLocationFrom("s3://", burl, "a/b/a=1/b=2/") == "a=1/b=2/")
    assert(toRelativeLocationFrom("s3://", burl, "s3://another/place/a=1") == "another/place/a=1")
    assert(toRelativeLocationFrom("", "relative/to/wd",
      "/absolute/from/root/relative/to/wd/place/a=1") == "place/a=1")
    assert(toRelativeLocationFrom("", "relative/to/wd",
      "/relative/to/wd/place/a=1") == "place/a=1")
  }

  test("partition path encode/decode round-trips in order") {
    val values = Seq("p1" -> "1", "p2" -> "a")
    assert(partitionPath(values) == "p1=1/p2=a")
    assert(parsePartitionPath("p1=1/p2=a").toSeq == values)
    // '=' in the value survives (split limit 2, hive_dataset.py:126)
    assert(parsePartitionPath("k=a=b").toSeq == Seq("k" -> "a=b"))
  }

  test("malformed partition path (missing '=') raises") {
    intercept[IllegalArgumentException](parsePartitionPath("p1=1/nonsense"))
  }

  test("fragment names order lexically and successor increments") {
    val first = firstFragmentName()
    assert(first.matches("000000_[0-9a-f]{32}\\.parquet"))
    val next = nextFragmentName(first)
    assert(fragmentIndex(next) == 1)
    assert(first < next) // zero-padded index → lexical order
    assert(fragmentIndex(nextFragmentName(s"some/dir/${fragmentName(41)}")) == 42)
  }

  test("unwrap returns value or fails loudly") {
    assert(Unwrap.unwrap(Some(7)) == 7)
    intercept[IllegalStateException](Unwrap.unwrap(None: Option[Int]))
  }
}
