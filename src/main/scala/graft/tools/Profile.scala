package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions._
import graft.operators.Dedup

/** Dev-only stage profiler for hot operators (not part of the driver
  * contract). */
object Profile {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val hashed = Tables.documents(spark, dir)
      .select(col("doc_id"),
        transform(Dedup.shingles(col("text")), s => polyHash(s)).as("shh"))
      .filter(size(col("shh")) > 0)
    time("shingle+hash")(hashed.count())
    val sigs = hashed.select(col("doc_id"),
      native.minhashSigs(col("shh"), Dedup.perms, Dedup.P).as("sig"))
    time("sigs")(sigs.count())
    time("sigs again")(sigs.count())
    val hs = Dedup.hashedShingles(spark, dir).select(col("doc_id"), col("shh"))
      .filter(size(col("shh")) > 0)
    time("hashedShingles")(hs.count())
    val sg = hs.select(col("doc_id"),
      native.minhashSigs(col("shh"), Dedup.perms, Dedup.P).as("sig"))
    val banded = sg.select(col("doc_id"), explode(array(
      (0 until Dedup.NBands).map(bb => struct(lit(bb).as("band"),
        (col("sig").getItem(2 * bb) * Dedup.P + col("sig").getItem(2 * bb + 1)).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    time("banded")(banded.count())
    val cands = banded.groupBy("band", "key")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i.cast("int") + 2, size(col("ids"))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("pr"))
      .select(col("pr.id_a"), col("pr.id_b"))
      .distinct()
    time("cands")(println("  n_cands=" + cands.count()))
    time("full minhashLsh")(Dedup.minhashLsh(spark, dir).count())
    time("ngramJaccard")(Dedup.ngramJaccard(spark, dir).count())
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        element_at(graft.functions.tokens(col("text")), 1).as("t0"),
        array_distinct(transform(Dedup.shingles(col("text")), s => polyHash(s))).as("sh"))
    val a = d.select(col("doc_id").as("id_a"), col("lang"), col("t0"), col("sh").as("sh_a"))
    val b = d.select(col("doc_id").as("id_b"), col("lang"), col("t0"), col("sh").as("sh_b"))
    time("ngram pairs join only")(
      a.join(b, Seq("lang", "t0")).filter(col("id_a") < col("id_b")).count())
    spark.stop()
  }
}
