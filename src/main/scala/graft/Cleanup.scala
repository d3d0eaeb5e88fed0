package graft

/** JVM-exit removal of scratch directories. Operators that materialize
  * bench-local artifacts (memoized postings indexes, round-trip
  * format scratch) register their base dirs here; one shutdown hook
  * sweeps them so repeated apps in one JVM — and repeated JVMs on one
  * host — never accumulate parquet under /tmp. Deliberately
  * best-effort: a failed delete must not mask the app's own exit. */
object Cleanup {
  // a keySet, not a queue: repeat registrations of the same base (the
  // deterministic round-trip scratch re-registers per query run) must
  // not grow exit-time work — one sweep per distinct directory
  private lazy val registered = {
    val s = java.util.concurrent.ConcurrentHashMap
      .newKeySet[java.nio.file.Path]()
    Runtime.getRuntime.addShutdownHook(new Thread(() => s.forEach { base =>
      try java.nio.file.Files.walk(base)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      catch { case _: Throwable => }
    }))
    s
  }

  /** Registers `path` for recursive removal at JVM exit (idempotent);
    * returns it. */
  def onExit(path: java.nio.file.Path): java.nio.file.Path = {
    registered.add(path)
    path
  }

  /** Bounded LRU memo for the session-checkpointed arm retrievals
    * ([[graft.operators.Experiment]] / the std-text arms): each entry
    * pins one localCheckpoint'ed frame's blocks, so an UNBOUNDED map
    * keyed on (k, nq, dim)-style shapes grows pinned blocks for the
    * life of any session whose callers sweep parameters. Eviction
    * (capacity or predicate) drops the entry's only reference; Spark's
    * ContextCleaner reference-tracks persisted RDDs — localCheckpoint
    * blocks included — and unpersists them once the frame is GC'd, so
    * reference-drop IS the reclaim. Builds run inside the lock:
    * concurrent same-key callers serialize instead of double-building
    * (the TrieMap getOrElseUpdate behavior, kept). */
  final class BoundedMemo[K, V](max: Int) {
    private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
        size() > max
    }
    def getOrElseUpdate(key: K)(build: => V): V = m.synchronized {
      val cur = m.get(key)
      if (cur != null) cur
      else { val v = build; m.put(key, v); v }
    }
    def evictWhere(p: K => Boolean): Unit = m.synchronized {
      val it = m.keySet.iterator
      while (it.hasNext) if (p(it.next())) it.remove()
    }
    def clear(): Unit = m.synchronized(m.clear())
  }

  /** Memoized per-(applicationId, key) scratch BUILD — the one
    * serving-index contract shared by the postings / TF-IDF / chunk /
    * IVF scratch layouts: entries of stopped applications are evicted
    * (one SparkContext per JVM, so a foreign applicationId can never
    * be read again), the build runs at most once per live key, and
    * the scratch base is swept at JVM exit. Returns the built path. */
  def memoizedBuild[K](cache: scala.collection.concurrent.TrieMap[(String, K), String],
                       spark: org.apache.spark.sql.SparkSession,
                       key: K, prefix: String)(build: String => Unit): String = {
    val app = spark.sparkContext.applicationId
    cache.keySet.filter(_._1 != app).foreach(cache.remove)
    cache.getOrElseUpdate((app, key), {
      val base = onExit(java.nio.file.Files.createTempDirectory(prefix))
      val p = base.resolve("index").toString
      build(p)
      p
    })
  }
}
