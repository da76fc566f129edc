package graft.sources

/** Package-private codec contracts for the manifest bloom filters —
  * lives in graft.sources to reach the `private[sources]` members.
  */
class BloomCodecSpec extends graft.SparkSpec {

  test("bloom bitmap codec round-trips and pre-bloom manifests stay conservative") {
    val positions = Seq(0L, 7L, 8L, 511L, 1023L)
    val hex = ManagedDataset.bitmapHex(positions)
    assert(hex.length == 256)
    positions.foreach(p => assert(ManagedDataset.bitSet(hex, p.toInt)))
    assert(!ManagedDataset.bitSet(hex, 1))
    assert(!ManagedDataset.bitSet(hex, 1022))
    // a manifest rendered WITHOUT blooms parses to empty bloom maps
    // and mayContainEquality degrades to the min/max window
    val fs = ManagedDataset.FileStat("f.parquet", 10L,
      Map("k" -> "5"), Map("k" -> "9"))
    val body = ManagedDataset.renderManifest(1L, "overwrite", Seq("d1"),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType))),
      stats = Map("d1" -> Seq(fs)))
    val parsed = ManagedDataset.parseManifest(body)
    val f = parsed.stats("d1").head
    assert(f.blooms.isEmpty)
    assert(ManagedDataset.mayContainEquality(
      org.apache.spark.sql.types.LongType, f, "k", "7"))
    assert(!ManagedDataset.mayContainEquality(
      org.apache.spark.sql.types.LongType, f, "k", "42"))
  }

  test("manifest blooms round-trip through render/parse byte-for-byte") {
    val hex = ManagedDataset.bitmapHex(Seq(3L, 99L, 1000L))
    val fs = ManagedDataset.FileStat("f.parquet", 5L,
      Map("k" -> "1"), Map("k" -> "9"), Map("k" -> hex))
    val body = ManagedDataset.renderManifest(2L, "append", Seq("d2"),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType))),
      stats = Map("d2" -> Seq(fs)))
    val parsed = ManagedDataset.parseManifest(body)
    assert(parsed.stats("d2").head.blooms("k") == hex)
  }

  test("portable hash matches the SQL rendering (driver-side vs HOF expression)") {
    val samples = Seq("7", "hello", "12345678901", "")
    samples.foreach { s0 =>
      val driver = ManagedDataset.portableHash(s0)
      val sqlH = spark.sql(
        "SELECT " + graft.functions.TextHash.spark.rollingHashHof(s"'$s0'"))
        .head().getLong(0)
      assert(driver == sqlH, s"hash mismatch for '$s0'")
    }
  }
}
