package graft.sources

import java.io.File

/** Per-process scratch directories that CLEAN UP AFTER THEMSELVES —
  * for operators whose write IS the operator (variant shredding,
  * training export), which rewrite their output every run and
  * therefore cannot share a path across concurrent JVMs.
  *
  * Two leak paths are closed:
  *  - our own exit: every directory handed out is registered with one
  *    JVM-wide shutdown hook that deletes the trees (a bench/test
  *    process no longer leaves one shredded copy of the dataset in
  *    java.io.tmpdir per run);
  *  - a predecessor's crash: sibling `<prefix>*_p<pid>` directories
  *    whose pid is NOT alive are swept on the next request — the same
  *    orphan discipline as [[LayoutCache]]'s `.tmp-*` sweep. A LIVE
  *    sibling (a concurrent bench) is never touched.
  */
object TempDirs {

  private val registered =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())
  @volatile private var hookInstalled = false

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRecursively)
    f.delete()
    ()
  }

  private def installHook(): Unit = synchronized {
    if (!hookInstalled) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        registered.forEach(p => deleteRecursively(new File(p)))
      }, "graft-tempdirs-cleanup"))
      hookInstalled = true
    }
  }

  /** `<tmpdir>/<prefix>_p<pid>` — stable within this process (the
    * caller overwrites it per run), deleted at JVM exit, with dead
    * predecessors' siblings swept eagerly. The caller should fold any
    * input fingerprint into `prefix` so different sources get
    * different trees. */
  def perProcess(prefix: String,
                 base: File = new File(System.getProperty("java.io.tmpdir"))): String = {
    // sweep ONLY dead processes' leftovers: a live pid (including ours)
    // may be mid-read in another thread of that process
    Option(base.listFiles()).toSeq.flatten.foreach { f =>
      val n = f.getName
      if (f.isDirectory && n.startsWith(prefix + "_p")) {
        // pid_t is 32-bit in the native liveness check, so a suffix
        // past Int.MaxValue could ALIAS a live pid — treat any
        // out-of-range suffix as not-provably-dead (never sweep it)
        val dead = n.drop(prefix.length + 2).toLongOption
          .exists(pid => pid > 0 && pid <= Int.MaxValue &&
            !ProcessHandle.of(pid).isPresent)
        if (dead) deleteRecursively(f)
      }
    }
    val dir = new File(base, s"${prefix}_p${ProcessHandle.current().pid()}")
    registered.add(dir.getAbsolutePath)
    installHook()
    dir.getAbsolutePath
  }
}
