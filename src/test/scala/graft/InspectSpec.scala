package graft

import graft.operators.Inspect
import org.apache.spark.sql.functions._

/** CLI-verb surface (reference main.py:25-85 semantics). */
class InspectSpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "name")
  }

  test("jsonHead returns at most n rows as JSON objects") {
    val head = Inspect.jsonHead(df, 2)
    assert(head.length == 2)
    assert(head.head.startsWith("{") && head.head.contains("\"id\""))
  }

  test("jsonl is distributed and covers every row") {
    assert(Inspect.jsonl(df).count() == 3)
  }

  test("concat_csv folds CSVs all-string and refuses overwrite") {
    withTempDir { dir =>
      df.limit(2).write.option("header", "true").csv(s"$dir/c1")
      df.where(col("id") === 3).write.option("header", "true").csv(s"$dir/c2")
      Inspect.concatCsvToParquet(spark, Seq(s"$dir/c1", s"$dir/c2"), s"$dir/out")
      val back = spark.read.parquet(s"$dir/out")
      assert(back.count() == 3)
      // all-string: no schema inference (main.py:52-54)
      assert(back.schema.fields.forall(_.dataType.typeName == "string"))
      // refuse overwrite (main.py:57-59)
      intercept[IllegalArgumentException] {
        Inspect.concatCsvToParquet(spark, Seq(s"$dir/c1"), s"$dir/out")
      }
    }
  }

  test("writeCsv skips an existing target (main.py:80-85)") {
    withTempDir { dir =>
      Inspect.writeCsv(df, s"$dir/out.csv")
      val first = spark.read.option("header", "true").csv(s"$dir/out.csv").count()
      Inspect.writeCsv(df.limit(1), s"$dir/out.csv") // silently skipped
      val second = spark.read.option("header", "true").csv(s"$dir/out.csv").count()
      assert(first == 3 && second == 3)
    }
  }

  test("jsonl roundtrip: readJsonl recovers what jsonl wrote") {
    withTempDir { dir =>
      val path = s"$dir/docs.jsonl"
      Inspect.jsonl(df).write.text(path)
      val back = Inspect.readJsonl(spark, path, Some(df.schema))
      assertSameData(back, df)
      // inferred read agrees too (witness data has no type ambiguity)
      assertSameData(Inspect.readJsonl(spark, path).select(df.columns.map(col): _*), df)
    }
  }

  test("readJsonlQuarantined: bad lines land in the side channel, good lines parse") {
    import org.apache.spark.sql.types._
    withTempDir { dir =>
      val path = s"$dir/feed.jsonl"
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        java.util.Arrays.asList(
          """{"id": 1, "name": "ok"}""",
          """{"id": broken!!}""",
          """{"id": 3, "name": "fine"}"""))
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("name", StringType)))
      val (good, bad) = Inspect.readJsonlQuarantined(spark, path, schema)
      assert(good.collect().map(_.getLong(0)).toSet == Set(1L, 3L))
      val quarantined = bad.collect().map(_.getString(0))
      assert(quarantined.length == 1 && quarantined.head.contains("broken!!"),
        s"the corrupt line must survive verbatim for triage: ${quarantined.toSeq}")
    }
  }

  test("diffSchemas: added/removed/retyped/unchanged classification") {
    import org.apache.spark.sql.functions.lit
    val before = df // (id bigint, name string)
    val after = df.withColumn("id", col("id").cast("string"))
      .withColumn("extra", lit(1))
      .drop("name")
    val r = Inspect.diffSchemas(before, after).collect()
      .map(row => row.getString(0) -> (row.getString(1),
        Option(row.getString(2)), Option(row.getString(3)))).toMap
    assert(r("id") == (("retyped", Some("BIGINT"), Some("STRING"))))
    assert(r("extra") == (("added", None, Some("INT"))))
    assert(r("name") == (("removed", Some("STRING"), None)))
    assert(Inspect.diffSchemas(before, before).collect()
      .forall(_.getString(1) == "unchanged"))
  }
}
