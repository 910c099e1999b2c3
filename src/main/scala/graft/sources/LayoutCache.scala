package graft.sources

import java.io.{File, RandomAccessFile}
import java.nio.channels.FileChannel
import java.nio.file.{Files, StandardCopyOption, StandardOpenOption}

/** Cross-JVM cache of derived data layouts (partitioned/bucketed
  * rewrites of source tables), keyed by a CONTENT fingerprint of the
  * source files and published ATOMICALLY.
  *
  * Why this exists: a layout that outlives the JVM (java.io.tmpdir, a
  * shared scratch volume) must answer two questions a session-scoped
  * catalog table never faces —
  *
  *  1. *Is the cached layout still derived from these source bytes?*
  *     Path+size+mtime is not an answer: the test corpus is
  *     regenerated in place between rounds, and a regenerated file
  *     with identical size and a preserved/coarse mtime would silently
  *     replay a stale layout. [[contentFingerprint]] hashes each
  *     file's length plus its first and last 64 KiB of actual bytes
  *     (for parquet, the tail covers the footer's row-group stats, which
  *     change with the data) — a sampled content key. Production would
  *     use a snapshot/version id from a table format instead.
  *
  *  2. *Can a reader ever observe a partial layout?* Not here: the
  *     builder writes to a process-unique `.tmp-*` sibling and
  *     publishes with one atomic directory rename, so the destination
  *     either does not exist or is complete. Concurrent builders are
  *     serialized by an OS file lock (plus a JVM-level monitor, since
  *     `FileChannel.lock` throws rather than blocks on same-process
  *     overlap); the lock holder re-checks completeness before
  *     building, so a complete layout is never deleted and the race
  *     loser simply reuses the winner's work. A crashed builder leaves
  *     only a `.tmp-*` orphan, swept by the next builder under the
  *     lock.
  *
  * Stale layouts for the same prefix but a DIFFERENT fingerprint
  * (the source was regenerated) are swept when a new fingerprint is
  * built, so regenerations don't accumulate dead sf0.1-sized copies.
  */
object LayoutCache {

  private val SampleBytes = 64 * 1024

  /** JVM-side serialization of builders per destination path —
    * `FileChannel.lock` is cross-process only and throws
    * OverlappingFileLockException for a second thread of the same JVM. */
  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Sampled content fingerprint: md5 over each file's (name, length,
    * first 64 KiB, last 64 KiB). Changing any sampled byte — or the
    * length — changes the key; a change confined to the unsampled
    * middle of a >128 KiB file does not (sampled, not full, content
    * addressing — the price of keeping the probe O(1) per file). */
  def contentFingerprint(files: Seq[File]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    files.foreach { f =>
      val len = f.length
      md.update(s"${f.getName}:$len:".getBytes("UTF-8"))
      if (len > 0) {
        val raf = new RandomAccessFile(f, "r")
        try {
          val head = new Array[Byte](math.min(len, SampleBytes.toLong).toInt)
          raf.readFully(head)
          md.update(head)
          if (len > SampleBytes) {
            val tail = new Array[Byte](SampleBytes)
            raf.seek(len - SampleBytes)
            raf.readFully(tail)
            md.update(tail)
          }
        } finally raf.close()
      }
    }
    md.digest().take(8).map("%02x".format(_)).mkString
  }

  /** [[contentFingerprint]] over a Hadoop [[org.apache.hadoop.fs.FileSystem]]
    * — byte-identical digest for the same (name, length, sampled
    * bytes), so local-FS callers can migrate without invalidating
    * cached layouts. This is the variant remote-capable consumers (the
    * MV staleness guard) MUST use: `java.io.File` silently sees
    * nothing on hdfs://, s3a://, or any non-local scheme. */
  def contentFingerprintHadoop(fs: org.apache.hadoop.fs.FileSystem,
                               files: Seq[org.apache.hadoop.fs.FileStatus]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    files.foreach { st =>
      val len = st.getLen
      md.update(s"${st.getPath.getName}:$len:".getBytes("UTF-8"))
      if (len > 0) {
        val in = fs.open(st.getPath)
        try {
          val head = new Array[Byte](math.min(len, SampleBytes.toLong).toInt)
          in.readFully(0L, head)
          md.update(head)
          if (len > SampleBytes) {
            val tail = new Array[Byte](SampleBytes)
            in.readFully(len - SampleBytes, tail)
            md.update(tail)
          }
        } finally in.close()
      }
    }
    md.digest().take(8).map("%02x".format(_)).mkString
  }

  private def complete(dir: File): Boolean = new File(dir, "_SUCCESS").exists()

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRecursively)
    f.delete()
    ()
  }

  /** Ensure `<base>/<scopeKey>_<fingerprint>` exists and is complete,
    * building it with `write(tmpPath)` if absent (the writer must leave
    * a `_SUCCESS` marker, as Spark's parquet committer does). Returns
    * the layout path. See the object doc for the atomicity contract. */
  /** `scope` names the SOURCE the fingerprint was taken over (e.g. the
    * source directory name): layouts of DIFFERENT scopes coexist —
    * sf0.001/sf0.01/sf0.1 each keep their own — while a new
    * fingerprint within one scope means that scope's source was
    * regenerated, so its old-fingerprint siblings are swept (retaining
    * the most recent previous generation — see [[sweep]]). The lock
    * file is PER SCOPE (not per fingerprint), so the sweep of a
    * scope's stale layouts is serialized against every builder of
    * that scope and can never delete a directory another builder of
    * the same scope is mid-publishing; other scopes' layouts are
    * never touched by either the lock or the sweep.
    *
    * The on-disk scope segment is `sanitize(scope).<md5(scope)/6hex>`:
    * sanitization alone is ambiguous (scopes "sf0.1" and "sf0.1 extra"
    * both sanitize to a prefix of the other's layout names, so a
    * prefix-based stale test could cross-sweep), and the appended
    * content hash of the RAW scope string plus an exact-shape stale
    * match (`<scopeKey>_` + exactly 16 hex fingerprint chars) makes
    * one scope's sweep blind to every other scope's layouts. */
  def ensure(prefix: String, scope: String, fingerprint: String,
             base: File = new File(System.getProperty("java.io.tmpdir")))
            (write: String => Unit): String = {
    require(fingerprint.matches("[0-9a-f]{16}"),
      s"fingerprint must be 16 lowercase hex chars (contentFingerprint), got '$fingerprint'")
    val scopeKey = s"${prefix}_${scopeTag(scope)}"
    val dest = new File(base, s"${scopeKey}_$fingerprint")
    if (complete(dest)) return dest.getAbsolutePath
    val monitor = jvmLocks.computeIfAbsent(
      new File(base, scopeKey).getAbsolutePath, _ => new Object)
    monitor.synchronized {
      val lockFile = new File(base, s"$scopeKey.lock")
      val ch = FileChannel.open(lockFile.toPath,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try {
          // may have been built while we waited for the lock
          if (complete(dest)) return dest.getAbsolutePath
          // a dest without _SUCCESS can only be a torn write from a
          // pre-atomic-publish version (publication is a single rename
          // of a complete tree) — remove it before publishing
          if (dest.exists()) deleteRecursively(dest)
          sweep(base, scopeKey, fingerprint)
          val tmp = new File(base, s"${scopeKey}_$fingerprint.tmp-" +
            java.util.UUID.randomUUID.toString.take(8))
          write(tmp.getAbsolutePath)
          require(complete(tmp),
            s"layout writer left no _SUCCESS under $tmp — refusing to publish")
          Files.move(tmp.toPath, dest.toPath, StandardCopyOption.ATOMIC_MOVE)
        } finally lock.release()
      } finally ch.close()
    }
    dest.getAbsolutePath
  }

  private def sanitize(s: String): String =
    s.map(c => if (c.isLetterOrDigit || c == '-' || c == '.') c else '_')

  /** Unambiguous on-disk scope segment: the readable sanitized name
    * plus 6 hex chars of md5 over the RAW scope string. Distinct raw
    * scopes get distinct tags (up to a 24-bit hash collision AND equal
    * sanitized names — negligible for the handful of scopes a host
    * sees), so the exact-shape stale match in [[sweep]] can never
    * claim another scope's layout. */
  private def scopeTag(scope: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(scope.getBytes("UTF-8")).take(3).map("%02x".format(_)).mkString
    s"${sanitize(scope)}.$h"
  }

  /** Under the SCOPE lock: drop this scope's other-fingerprint
    * siblings (the scope's source was regenerated — those layouts can
    * never validate again) and its orphaned `.tmp-*` trees from
    * crashed builders. Matching is exact-shape — `<scopeKey>_` +
    * exactly 16 hex chars — so a scope whose name extends another's
    * can never be swept as its sibling. Other scopes' layouts are
    * never touched.
    *
    * READER SAFETY: the most recently modified stale sibling — the
    * generation that was current until this regeneration — is
    * RETAINED, not deleted. A reader in another JVM resolves a layout
    * path without holding the scope lock, so a long scan of the
    * previous generation must survive one regeneration; it loses files
    * only if it holds a path across TWO regenerations (the same
    * one-previous-snapshot discipline as TxnLog's vacuum). Older
    * generations (and all `.tmp-*` orphans) are deleted. */
  private def sweep(base: File, scopeKey: String, keepFingerprint: String): Unit = {
    val keep = s"${scopeKey}_$keepFingerprint"
    val gen = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(scopeKey + "_") + "[0-9a-f]{16}")
    val all = Option(base.listFiles()).toSeq.flatten
    val staleGens = all.filter { f =>
      val n = f.getName
      gen.matcher(n).matches() && n != keep
    }
    val retained = staleGens.sortBy(-_.lastModified()).headOption
    staleGens.filterNot(retained.contains).foreach(deleteRecursively)
    all.filter { f =>
      val n = f.getName
      n.startsWith(scopeKey + "_") && n.contains(".tmp-")
    }.foreach(deleteRecursively)
  }
}
