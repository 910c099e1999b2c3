package graft

import java.io.File
import java.nio.file.Files

import graft.sources.TempDirs

/** Per-process scratch dirs: dead predecessors swept, live siblings
  * (and our own dir) untouched. Pure filesystem. */
class TempDirsSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("dead-pid siblings are swept; live siblings and own dir survive") {
    val base = Files.createTempDirectory("tempdirs_spec").toFile
    // a REAL pid that is provably dead: spawn-and-reap a trivial
    // process and use its pid. (The previous fixture used
    // (1 << 40) + 12345 as an "impossible" pid, but pid_t is 32-bit in
    // the native liveness check, so it can alias pid 12345 — which
    // periodically EXISTS on a busy box and made this test flake
    // under the full parallel suite.)
    val deadPid = {
      val p = new ProcessBuilder("true").start()
      p.waitFor()
      p.pid()
    }
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
