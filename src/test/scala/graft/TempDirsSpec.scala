package graft

import java.io.File
import java.nio.file.Files

import graft.sources.TempDirs

/** Per-process scratch dirs: dead predecessors swept, live siblings
  * (and our own dir) untouched. Pure filesystem. */
class TempDirsSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("dead-pid siblings are swept; live siblings and own dir survive") {
    val base = Files.createTempDirectory("tempdirs_spec").toFile
    // a pid that cannot be alive (kernel pid_max is far below 2^40)
    val deadPid = (1L << 40) + 12345L
    val dead = new File(base, s"pfx_p$deadPid")
    dead.mkdirs()
    Files.writeString(new File(dead, "leftover").toPath, "x")
    // a live sibling: OUR pid under a doctored name suffix is not
    // constructible, so use the real current pid with the same prefix
    val livePid = ProcessHandle.current().pid()
    val live = new File(base, s"pfx_p$livePid")
    live.mkdirs()
    val own = TempDirs.perProcess("pfx", base)
    assert(!dead.exists(), "dead process's leftover must be swept")
    assert(new File(own).getName == s"pfx_p$livePid")
    assert(live.exists(), "a live process's dir must never be swept")
    // a DIFFERENT prefix's dead dir is untouched
    val other = new File(base, s"other_p$deadPid")
    other.mkdirs()
    TempDirs.perProcess("pfx", base)
    assert(other.exists())
  }

  test("non-numeric pid suffixes are never treated as dead") {
    val base = Files.createTempDirectory("tempdirs_spec2").toFile
    val weird = new File(base, "pfx_pnotapid")
    weird.mkdirs()
    TempDirs.perProcess("pfx", base)
    assert(weird.exists())
  }
}
