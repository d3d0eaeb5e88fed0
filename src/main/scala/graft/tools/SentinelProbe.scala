package graft.tools

/** Host-sentinel self-test: prints N samples of both sentinel
  * components ([[H2Run.sentinelMs]] CPU spin, [[H2Run.sentinelIoMs]]
  * write+fsync+direct-read probe), optionally under self-generated
  * load, so a new host's quiet bounds ([[H2Run.QuietAbsMs]] /
  * [[H2Run.IoQuietAbsMs]]) can be validated before trusting a bench
  * artifact's quiet fields.
  *
  * args: [nSamples] [cpuload|ioload]
  *   cpuload — saturate all cores with spin threads while sampling
  *   ioload  — run concurrent large buffered writes while sampling
  */
object SentinelProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(8)
    val mode = args.drop(1).headOption.getOrElse("")
    @volatile var stop = false
    val loaders: Seq[Thread] = mode match {
      case "cpuload" =>
        (1 to Runtime.getRuntime.availableProcessors).map { _ =>
          val t = new Thread(() => {
            var x = 1L
            while (!stop) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17 }
            if (x == 42) print("")
          })
          t.setDaemon(true); t.start(); t
        }
      case "ioload" =>
        (1 to 4).map { i =>
          val t = new Thread(() => {
            val p = java.nio.file.Files.createTempFile(s"sentload$i", ".bin")
            val a = new Array[Byte](1 << 20)
            try while (!stop) {
              val ch = java.nio.channels.FileChannel.open(p,
                java.nio.file.StandardOpenOption.WRITE,
                java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
              var j = 0
              while (j < 512 && !stop) { // 512 MiB per cycle
                ch.write(java.nio.ByteBuffer.wrap(a)); j += 1
              }
              ch.force(true); ch.close()
            } finally java.nio.file.Files.deleteIfExists(p)
          })
          t.setDaemon(true); t.start(); t
        }
      case _ => Nil
    }
    Thread.sleep(if (loaders.nonEmpty) 1000 else 0)
    for (_ <- 1 to n) {
      val s = H2Run.sample()
      println(f"SENT cpu=${s.cpu}%.1f io=${s.io}%.1f quiet_abs=" +
        f"${s.cpu <= H2Run.QuietAbsMs && s.io <= H2Run.IoQuietAbsMs}")
    }
    stop = true
    loaders.foreach(_.join(3000))
  }
}
