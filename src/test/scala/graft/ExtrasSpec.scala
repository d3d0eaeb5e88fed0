package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => Fn}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.Skew
import graft.sources.Sources

class ExtensionsSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("graft functions are callable from pure SQL after registration") {
    GraftExtensions.register(spark)
    import spark.implicits._
    spark.sql("SELECT graft_polyhash('hello') AS h").as[Long].head() shouldBe
      Tables.documents(spark, sfDir).limit(1)
        .select(graft.functions.polyHash(lit("hello"))).as[Long].head()
    spark.sql(
      """SELECT graft_dot(embedding, embedding) AS d
        |FROM parquet.`/root/testdata/sf0.001/embeddings.parquet` LIMIT 1""".stripMargin)
      .as[Double].head() shouldBe 1.0 +- 0.001
    val topk = spark.sql(
      """SELECT label, graft_topk_by(CAST(vec_id AS DOUBLE), vec_id, 3) AS tk
        |FROM parquet.`/root/testdata/sf0.001/embeddings.parquet`
        |GROUP BY label""".stripMargin)
    topk.select(Fn.size(col("tk"))).distinct().collect()
      .map(_.getInt(0)).toSet shouldBe Set(3)
  }
}

class SourcesSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("JSONL documents/queries and qrels.json round-trip") {
    val dir = Files.createTempDirectory("graft-sources").toFile
    val docs = new java.io.File(dir, "documents.jsonl")
    Files.writeString(docs.toPath,
      """{"id":"d1","text":"hello world","category":"c1","timestamp":"2024-01-01","source":"s1"}
        |{"id":"d2","text":"more text","category":"c2","timestamp":"2024-01-02","source":"s2"}
        |""".stripMargin)
    val queries = new java.io.File(dir, "queries.jsonl")
    Files.writeString(queries.toPath,
      """{"id":"q1","query":"hello"}
        |""".stripMargin)
    val qrels = new java.io.File(dir, "qrels.json")
    Files.writeString(qrels.toPath, """{"q1": ["d1", "d2"], "q2": ["d2"]}""")

    val d = Sources.readDocumentsJsonl(spark, docs.getAbsolutePath)
    d.count() shouldBe 2
    d.schema.fieldNames.toSeq shouldBe Seq("id", "text", "category", "timestamp", "source")
    Sources.readQueriesJsonl(spark, queries.getAbsolutePath).count() shouldBe 1
    val qr = Sources.readQrelsJson(spark, qrels.getAbsolutePath)
    qr.count() shouldBe 3
    qr.filter(col("q_id") === "q1").count() shouldBe 2

    val out = new java.io.File(dir, "summary")
    Sources.writeSummaryCsv(d.groupBy("category").count(), out.getAbsolutePath)
    val back = Sources.readSummaryCsv(spark, out.getAbsolutePath,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("category", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("count", org.apache.spark.sql.types.LongType))))
    back.count() shouldBe 2
  }
}

class ApproxSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("approx sketches land within tolerance of exact values") {
    import spark.implicits._
    val approx = graft.operators.PerfStats.approxSummary(spark, sfDir)
    val exact = Tables.events(spark, sfDir).groupBy("event_type")
      .agg(countDistinct("user_id").as("exact_users"),
        expr("percentile(value, 0.5)").as("exact_p50"))
    val joined = approx.join(exact, "event_type")
      .select(col("event_type"), col("approx_users"), col("exact_users"),
        col("approx_pcts").getItem(0).as("approx_p50"), col("exact_p50"))
      .collect()
    joined should not be empty
    joined.foreach { r =>
      val (au, eu) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      math.abs(au - eu) / eu should be < 0.15
      math.abs(r.getDouble(3) - r.getDouble(4)) should be < 1.0
    }
  }
}

class SkewSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("saltedAgg equals plain aggregation") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sfDir)
    val salted = Skew.saltedAgg(li, col("l_returnflag"), col("l_orderkey"), 8,
      col("l_quantity"), sum, sum)
      .withColumnRenamed("_k", "l_returnflag")
    val plain = li.groupBy("l_returnflag").agg(sum("l_quantity").as("value"))
    // integer-valued quantities: sums are exact, so exact equality holds
    salted.exceptAll(plain).count() shouldBe 0
    plain.exceptAll(salted).count() shouldBe 0
  }

  test("capBuckets drops oversized buckets only") {
    import spark.implicits._
    val buckets = Seq(
      ("a", Seq(1L, 2L)),
      ("b", (1L to 100L))).toDF("key", "ids")
    val capped = Skew.capBuckets(buckets, "ids", 50)
    capped.count() shouldBe 1
    capped.select("key").as[String].head() shouldBe "a"
  }

  test("saltOf is deterministic and within range") {
    import spark.implicits._
    val s = Tables.orders(spark, sfDir)
      .select(Skew.saltOf(col("o_orderkey"), 16).as("s"))
    s.agg(min("s"), max("s")).as[(Int, Int)].head() match {
      case (lo, hi) => lo should be >= 0; hi should be < 16
    }
    val a = s.groupBy("s").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val b = s.groupBy("s").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    a shouldBe b
  }
}
