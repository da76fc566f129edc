package graft

import graft.sources.HiveDataset
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based round-trip invariants for the dataset layer —
  * strictly more coverage than the reference's example-based tests
  * (SURVEY.md §5): for arbitrary partition layouts and row contents,
  * write→scan is lossless, write is idempotent, and append is
  * additive. Partition values are limited to path-safe alphanumerics
  * (the reference never escapes path metacharacters either).
  * Uses ScalaCheck generators with a fixed seed (deterministic CI). */
class HiveDatasetPropSpec extends SparkSpec {

  private val partVal = Gen.choose(1, 8).flatMap(n =>
    Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))

  private val rowsGen: Gen[List[(String, Long, String)]] = for {
    nParts <- Gen.choose(1, 4)
    parts <- Gen.listOfN(nParts, partVal)
    rows <- Gen.listOfN(12, for {
      p <- Gen.oneOf(parts)
      v <- Gen.choose(-1000L, 1000L)
      s <- Gen.listOfN(5, Gen.alphaNumChar).map(_.mkString)
    } yield (p, v, s))
  } yield rows

  test("write→scan is lossless, write idempotent, append additive (generated layouts)") {
    (1 to 5).foreach { i =>
      val rows = rowsGen.apply(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(fail(s"generator produced no sample for seed $i"))
      import spark.implicits._
      withTempDir { dir =>
        val df = rows.toDF("p", "v", "s")
        val ds = HiveDataset(dir, Seq("p"))
        ds.write(df)
        assertSameData(ds.scan().get, df)
        ds.write(df) // idempotent overwrite
        assertSameData(ds.scan().get, df)
        ds.append(df) // additive
        assert(ds.scan().get.count() == 2L * rows.size)
      }
    }
  }
}
