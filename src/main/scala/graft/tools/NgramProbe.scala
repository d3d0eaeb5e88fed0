package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Skew}

/** Dev-only stage timing for dedup_ngram_jaccard at sf0.1. */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ngram] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warm
    Dedup.ngramJaccard(spark, dir).count()
    val hs = Dedup.hashedShingles(spark, dir)
      .select(col("doc_id"), col("lang"), col("t0"),
        array_distinct(col("shh")).as("sh"))
    time("hashedShingles+distinct")(hs.count())
    time("hashedShingles+distinct again")(hs.count())
    val capped = Skew.capBlocks(hs, Seq("lang", "t0"), Dedup.MaxBlock)
    time("capBlocks")(capped.count())
    val joined = capped.as("a").join(capped.as("b"),
      col("a.lang") === col("b.lang") && col("a.t0") === col("b.t0") &&
        col("a.doc_id") < col("b.doc_id"))
    time("join pairs")(joined.count())
    val lenf = joined.filter(
      least(size(col("a.sh")), size(col("b.sh"))).cast("double") >=
        lit(0.2) * greatest(size(col("a.sh")), size(col("b.sh"))))
    time("after length filter")(lenf.count())
    time("full query")(Dedup.ngramJaccard(spark, dir).count())
    time("full query again")(Dedup.ngramJaccard(spark, dir).count())
    spark.stop()
  }
}
