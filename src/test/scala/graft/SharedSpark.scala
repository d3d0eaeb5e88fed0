package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Suite

trait SharedSpark extends BeforeAndAfterAll { self: Suite =>
  lazy val spark: SparkSession = SharedSpark.session
  val sfDir = "/root/testdata/sf0.001"

  /** Spec-scratch directory, deleted when the test JVM exits — specs
    * that wrote bare Files.createTempDirectory leaked hundreds of
    * parquet scratch dirs into /tmp across runs. */
  def tempDir(prefix: String): String = SharedSpark.tempDir(prefix)

  override def afterAll(): Unit = super.afterAll()
}

object SharedSpark {
  private val cleaner = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      cleaner.forEach { base =>
        try java.nio.file.Files.walk(base)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        catch { case _: Throwable => }
      }))
  }

  def tempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    cleaner.add(p)
    p.toString
  }
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
