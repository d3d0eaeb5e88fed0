package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.{Ann, Knn}

/** IVF index small-file compaction (Ann.compactIvfIndex). */
class CompactionSpec extends AnyFunSuite with Matchers with SharedSpark {

  private def parquetFiles(dir: java.io.File): Map[String, Int] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("c_id="))
      .map(d => d.getName ->
        d.listFiles().count(_.getName.endsWith(".parquet"))).toMap

  test("compaction consolidates appended partitions and preserves results") {
    val path = s"${tempDir("graft-compact")}/ivf"
    val docs = Knn.docSet(spark, sfDir)
    // base index from the first half, then many small appends — the
    // streaming-ingest debt pattern
    Ann.writeIvfIndex(spark, sfDir, path,
      Some(docs.filter(col("doc_id") % 2 === 0)))
    val odd = docs.filter(col("doc_id") % 2 === 1)
    (0 until 6).foreach { i =>
      Ann.appendToIvfIndex(spark, sfDir,
        odd.filter(col("doc_id") % 12 === (2 * i + 1)), path)
    }
    val before = parquetFiles(new java.io.File(path))
    before.values.max should be > 4 // debt exists
    val resultsBefore = Ann.ivfIndexed(spark, sfDir, path)
      .collect().map(_.toString).sorted
    val rowsBefore = spark.read.parquet(path).count()

    val compacted = Ann.compactIvfIndex(spark, path, maxFilesPerPartition = 4)
    compacted should not be empty

    val after = parquetFiles(new java.io.File(path))
    // every compacted partition is down to one file; untouched
    // partitions keep their file count
    compacted.foreach(c => after(s"c_id=$c") shouldBe 1)
    before.filter { case (k, _) =>
      !compacted.contains(k.stripPrefix("c_id=").toLong) }
      .foreach { case (k, n) => after(k) shouldBe n }
    // contents and search results are byte-for-byte unchanged
    spark.read.parquet(path).count() shouldBe rowsBefore
    Ann.ivfIndexed(spark, sfDir, path)
      .collect().map(_.toString).sorted shouldBe resultsBefore

    // idempotent: nothing left over the threshold
    Ann.compactIvfIndex(spark, path, maxFilesPerPartition = 4) shouldBe empty
  }

  test("bucketed-table compaction restores one file per bucket, contents intact") {
    import spark.implicits._
    val table = "graft_compact_bt"
    val nBuckets = 4
    // the catalog is per-JVM but the warehouse dir persists: clear
    // both so a previous crashed run can't fail the managed CTAS
    Seq(table, "graft_compact_bt2").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val p = new org.apache.hadoop.fs.Path(s"$wh/$t")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    def part(lo: Int, hi: Int) =
      (lo until hi).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
    operators.Bucketing.writeBucketed(part(0, 100), table, "id", nBuckets)
    // streaming-style appends: one extra file per touched bucket each
    (0 until 3).foreach { b =>
      part(100 + 40 * b, 140 + 40 * b).write.mode("append").format("parquet")
        .bucketBy(nBuckets, "id").sortBy("id").saveAsTable(table)
    }
    def files(): Int = {
      val loc = spark.sql(s"DESCRIBE EXTENDED $table").collect()
        .find(_.getString(0) == "Location").get.getString(1)
      new java.io.File(new java.net.URI(loc)).listFiles()
        .count(_.getName.endsWith(".parquet"))
    }
    val before = spark.table(table).collect().map(_.toString).sorted
    files() should be > nBuckets
    operators.Bucketing.compactBucketed(spark, table, "id", nBuckets)
    files() shouldBe nBuckets
    spark.table(table).collect().map(_.toString).sorted shouldBe before
    // the layout is still bucket-joinable shuffle-free on the key side
    val other = "graft_compact_bt2"
    operators.Bucketing.writeBucketed(part(0, 50), other, "id", nBuckets)
    val plan = operators.Bucketing.join(spark, table, other, "id")
      .queryExecution.executedPlan.toString()
    plan should not include "Exchange hashpartitioning"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS $other")
  }

  test("compaction completes a swap interrupted between drop and rename") {
    import spark.implicits._
    val table = "graft_compact_recover"
    val tmp = s"${table}__compacting"
    Seq(table, tmp).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val p = new org.apache.hadoop.fs.Path(s"$wh/$t")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    val df = (0 until 80).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
    // simulate the crash window: the compacted rewrite committed under
    // the temp name, the original was dropped, the rename never ran
    operators.Bucketing.writeBucketed(
      df.repartition(4, col("id")), tmp, "id", 4)
    val expected = spark.table(tmp).collect().map(_.toString).sorted
    operators.Bucketing.compactBucketed(spark, table, "id", 4)
    spark.catalog.tableExists(table) shouldBe true
    spark.catalog.tableExists(tmp) shouldBe false
    spark.table(table).collect().map(_.toString).sorted shouldBe expected
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("compaction preserves an external table's data directory and survives rewrite-first ordering") {
    import spark.implicits._
    val table = "graft_compact_ext"
    Seq(table, s"${table}__compacting").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val p = new org.apache.hadoop.fs.Path(s"$wh/$t")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    val loc = s"${tempDir("graft-compact-ext")}/data"
    def part(lo: Int, hi: Int) =
      (lo until hi).map(i => (i.toLong, s"v$i")).toDF("id", "payload")
    // explicit path → Spark creates an EXTERNAL table over loc
    part(0, 60).write.option("path", loc).format("parquet")
      .bucketBy(2, "id").sortBy("id").saveAsTable(table)
    part(60, 100).write.mode("append").format("parquet")
      .bucketBy(2, "id").sortBy("id").saveAsTable(table)
    val extDir = new java.io.File(loc)
    val extFilesBefore =
      extDir.listFiles().count(_.getName.endsWith(".parquet"))
    extFilesBefore should be > 2
    val before = spark.table(table).collect().map(_.toString).sorted

    operators.Bucketing.compactBucketed(spark, table, "id", 2)

    // contents intact, layout compacted to one file per bucket
    spark.table(table).collect().map(_.toString).sorted shouldBe before
    // the original EXTERNAL directory was NOT deleted: every
    // pre-compaction file is still there for the operator to reclaim
    extDir.listFiles()
      .count(_.getName.endsWith(".parquet")) shouldBe extFilesBefore
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("flat compaction folds append debt, preserves metadata dirs and results") {
    import org.apache.spark.sql.functions.col
    val idx = s"${tempDir("graft-flatcompact")}/postings"
    operators.Encoders.writeTfidfIndex(spark, sfDir, idx)
    val before = operators.Encoders.tfIdfSearchIndexed(spark, idx)
      .collect().map(_.toString).sorted
    // simulate append debt: re-land the existing rows in many batches
    // under the frozen fit (10 disjoint single-shard appends)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val fresh = s"${tempDir("graft-flatcompact2")}/postings"
    // the frozen fit must be in place before any append reads it
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(fresh))
    org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(s"$idx/_vocab"),
      fs, new org.apache.hadoop.fs.Path(s"$fresh/_vocab"), false,
      spark.sparkContext.hadoopConfiguration)
    (0L until 10L).foreach { k =>
      operators.Encoders.appendToTfidfIndex(spark,
        docs.filter(col("doc_id") % 10 === k), fresh)
    }
    def nFiles(p: String) = fs.listStatus(new org.apache.hadoop.fs.Path(p))
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    nFiles(fresh) should be > 8
    val done = operators.Compaction.compactFlat(spark, fresh)
    done should not be empty
    nFiles(fresh) shouldBe 1
    // metadata preserved, rows identical, search identical
    fs.exists(new org.apache.hadoop.fs.Path(s"$fresh/_vocab")) shouldBe true
    operators.Encoders.tfIdfSearchIndexed(spark, fresh)
      .collect().map(_.toString).sorted shouldBe before
    // below threshold now: idempotent no-op
    operators.Compaction.compactFlat(spark, fresh) shouldBe None
  }

  test("flat compaction completes a swap interrupted between the renames") {
    val base = tempDir("graft-flatrecover")
    val idx = s"$base/codes"
    operators.Ann.writeSq8Index(spark, sfDir, idx)
    val expected = operators.Ann.sq8Indexed(spark, sfDir, idx)
      .collect().map(_.toString).sorted
    // simulate the crash window: the rewrite (with metadata moved in)
    // sits under the temp name, the original is set aside, the
    // promoting rename never ran
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(idx),
      new org.apache.hadoop.fs.Path(s"$idx.__compact"))
    operators.Compaction.compactFlat(spark, idx) shouldBe None // recovery
    fs.exists(new org.apache.hadoop.fs.Path(s"$idx.__compact")) shouldBe false
    fs.exists(new org.apache.hadoop.fs.Path(s"$idx/_fit")) shouldBe true
    operators.Ann.sq8Indexed(spark, sfDir, idx)
      .collect().map(_.toString).sorted shouldBe expected
  }
}
