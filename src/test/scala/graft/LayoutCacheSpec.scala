package graft

import java.io.File
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import graft.sources.LayoutCache

/** Contract tests for the cross-JVM layout cache: atomic publish,
  * builder serialization, torn-write recovery, content fingerprinting,
  * stale-sibling sweep with one-previous-generation reader safety.
  * Pure filesystem — no Spark session needed. */
class LayoutCacheSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def tmpBase(): File =
    Files.createTempDirectory("layout_cache_spec").toFile

  // 16-hex-char fingerprints, the exact shape contentFingerprint emits
  // (ensure() rejects anything else — the sweep's stale match depends
  // on it); callers pass a single hex digit
  private def fp(seed: String): String = {
    require(seed.length == 1 && "0123456789abcdef".contains(seed))
    seed * 16
  }

  private def writeLayout(dir: String, payload: String = "data"): Unit = {
    val d = new File(dir)
    d.mkdirs()
    Files.writeString(new File(d, "part-0").toPath, payload)
    Files.writeString(new File(d, "_SUCCESS").toPath, "")
    ()
  }

  /** Destination dir a given fingerprint would publish to, derived
    * from a sibling ensure() result (scope naming is an internal). */
  private def destFor(sibling: String, siblingFp: String, fp: String): File =
    new File(sibling.stripSuffix(siblingFp) + fp)

  test("builds once, reuses on subsequent calls") {
    val base = tmpBase()
    val builds = new AtomicInteger(0)
    val p1 = LayoutCache.ensure("lay", "src", fp("a"), base) { tmp =>
      builds.incrementAndGet(); writeLayout(tmp)
    }
    val p2 = LayoutCache.ensure("lay", "src", fp("a"), base) { tmp =>
      builds.incrementAndGet(); writeLayout(tmp)
    }
    assert(p1 == p2)
    assert(builds.get() == 1)
    assert(new File(p1, "_SUCCESS").exists())
    assert(Files.readString(new File(p1, "part-0").toPath) == "data")
  }

  test("a malformed fingerprint is rejected up front") {
    val base = tmpBase()
    intercept[IllegalArgumentException] {
      LayoutCache.ensure("lay", "src", "abcd", base)(writeLayout(_))
    }
  }

  test("a destination without _SUCCESS (torn legacy write) is rebuilt") {
    val base = tmpBase()
    val ref = LayoutCache.ensure("lay", "src", fp("a"), base)(writeLayout(_))
    val torn = destFor(ref, fp("a"), fp("b"))
    torn.mkdirs()
    Files.writeString(new File(torn, "part-0").toPath, "partial")
    val p = LayoutCache.ensure("lay", "src", fp("b"), base)(writeLayout(_, "fresh"))
    assert(Files.readString(new File(p, "part-0").toPath) == "fresh")
    assert(new File(p, "_SUCCESS").exists())
  }

  test("a builder that crashes leaves no destination; the next builder succeeds") {
    val base = tmpBase()
    intercept[RuntimeException] {
      LayoutCache.ensure("lay", "src", fp("c"), base) { tmp =>
        new File(tmp).mkdirs()
        Files.writeString(new File(tmp, "part-0").toPath, "half")
        throw new RuntimeException("writer crash")
      }
    }
    val p = LayoutCache.ensure("lay", "src", fp("c"), base)(writeLayout(_, "retry"))
    assert(Files.readString(new File(p, "part-0").toPath) == "retry")
    // the crashed builder's .tmp-* orphan was swept by the retry
    val orphans = base.listFiles().filter(_.getName.contains(".tmp-"))
    assert(orphans.isEmpty, s"orphan tmp dirs remain: ${orphans.mkString(",")}")
  }

  test("a writer that omits _SUCCESS is refused publication") {
    val base = tmpBase()
    intercept[IllegalArgumentException] {
      LayoutCache.ensure("lay", "src", fp("d"), base) { tmp =>
        new File(tmp).mkdirs()
        Files.writeString(new File(tmp, "part-0").toPath, "no marker")
      }
    }
    // no PUBLISHED destination may exist (the refused writer's .tmp-*
    // orphan is legal — the next builder sweeps it under the lock)
    assert(base.listFiles().forall(f => !f.getName.endsWith("_" + fp("d"))),
      base.listFiles().mkString(","))
  }

  test("concurrent builders: exactly one build, every caller sees a complete layout") {
    val base = tmpBase()
    val builds = new AtomicInteger(0)
    val threads = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val fs = (1 to threads).map { i =>
      scala.concurrent.Future {
        LayoutCache.ensure("lay", "src", fp("e"), base) { tmp =>
          builds.incrementAndGet()
          Thread.sleep(50) // widen the race window
          writeLayout(tmp, s"builder-$i")
        }
      }
    }
    val paths = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(fs),
      scala.concurrent.duration.Duration(30, "s"))
    pool.shutdown()
    assert(builds.get() == 1, "the lock must serialize builders down to one build")
    assert(paths.toSet.size == 1)
    assert(new File(paths.head, "_SUCCESS").exists())
  }

  test("sweep retains one previous generation; two regenerations evict it") {
    val base = tmpBase()
    val g1 = LayoutCache.ensure("lay", "src", fp("1"), base)(writeLayout(_, "gen1"))
    // sources regenerated → new fingerprint. The PREVIOUS generation is
    // retained: a reader that resolved g1 before this build must be
    // able to finish its scan (readers don't hold the scope lock).
    val g2 = LayoutCache.ensure("lay", "src", fp("2"), base)(writeLayout(_, "gen2"))
    assert(new File(g1, "part-0").exists(),
      "previous generation must survive one regeneration (reader safety)")
    assert(Files.readString(new File(g1, "part-0").toPath) == "gen1")
    // second regeneration: g1 is now two generations old → swept; g2 retained
    val g3 = LayoutCache.ensure("lay", "src", fp("3"), base)(writeLayout(_, "gen3"))
    assert(!new File(g1).exists(), "two-generations-old layout must be swept")
    assert(new File(g2, "part-0").exists(), "immediately-previous generation retained")
    assert(new File(g3, "_SUCCESS").exists())
    // flip-flop back to the retained fingerprint reuses it without a build
    val builds = new AtomicInteger(0)
    val back = LayoutCache.ensure("lay", "src", fp("2"), base) { tmp =>
      builds.incrementAndGet(); writeLayout(tmp)
    }
    assert(back == g2 && builds.get() == 0)
  }

  test("a different prefix is never touched by the sweep") {
    val base = tmpBase()
    val other = LayoutCache.ensure("other", "src", fp("1"), base)(writeLayout(_))
    LayoutCache.ensure("lay", "src", fp("1"), base)(writeLayout(_))
    LayoutCache.ensure("lay", "src", fp("2"), base)(writeLayout(_))
    LayoutCache.ensure("lay", "src", fp("3"), base)(writeLayout(_))
    assert(new File(other, "_SUCCESS").exists())
  }

  test("different scopes coexist; a rebuild sweeps only its own scope") {
    val base = tmpBase()
    // three simultaneously-valid sources (sf0.001/sf0.01/sf0.1)
    val a = LayoutCache.ensure("lay", "sf0.001", fp("a"), base)(writeLayout(_))
    val b = LayoutCache.ensure("lay", "sf0.01", fp("b"), base)(writeLayout(_))
    val c1 = LayoutCache.ensure("lay", "sf0.1", fp("1"), base)(writeLayout(_))
    // sf0.1 regenerated twice: only ITS stale layouts are evicted
    LayoutCache.ensure("lay", "sf0.1", fp("2"), base)(writeLayout(_))
    val c3 = LayoutCache.ensure("lay", "sf0.1", fp("3"), base)(writeLayout(_))
    assert(!new File(c1).exists(), "two-generations-old sf0.1 layout swept")
    assert(new File(c3, "_SUCCESS").exists())
    assert(new File(a, "_SUCCESS").exists(),
      "sibling scope evicted by another scope's rebuild")
    assert(new File(b, "_SUCCESS").exists())
  }

  test("a scope whose name extends another scope's is never cross-swept") {
    val base = tmpBase()
    // sanitize("sf0.1 extra") == "sf0.1_extra": under prefix-based
    // matching this layout LOOKS like a stale sibling of scope "sf0.1"
    val ext = LayoutCache.ensure("lay", "sf0.1 extra", fp("a"), base)(writeLayout(_))
    LayoutCache.ensure("lay", "sf0.1", fp("1"), base)(writeLayout(_))
    LayoutCache.ensure("lay", "sf0.1", fp("2"), base)(writeLayout(_))
    LayoutCache.ensure("lay", "sf0.1", fp("3"), base)(writeLayout(_))
    assert(new File(ext, "_SUCCESS").exists(),
      "extending-name scope's layout deleted by the shorter scope's sweep")
  }

  test("content fingerprint tracks sampled bytes, not just size+mtime") {
    val base = tmpBase()
    val f = new File(base, "src.bin")
    Files.write(f.toPath, Array.fill[Byte](1024)(1))
    val fp1 = LayoutCache.contentFingerprint(Seq(f))
    assert(fp1.matches("[0-9a-f]{16}"), fp1)
    val mtime = f.lastModified()
    // same size, same (restored) mtime, different bytes → different key
    Files.write(f.toPath, Array.fill[Byte](1024)(2))
    f.setLastModified(mtime)
    val fp2 = LayoutCache.contentFingerprint(Seq(f))
    assert(fp1 != fp2, "regenerated bytes with identical size+mtime must miss")
    // identical bytes → identical key regardless of mtime
    Files.write(f.toPath, Array.fill[Byte](1024)(1))
    assert(LayoutCache.contentFingerprint(Seq(f)) == fp1)
    // tail change beyond the 64 KiB head sample is still caught
    val big = new File(base, "big.bin")
    Files.write(big.toPath, Array.fill[Byte](200 * 1024)(3))
    val bfp1 = LayoutCache.contentFingerprint(Seq(big))
    val bytes = Files.readAllBytes(big.toPath)
    bytes(bytes.length - 1) = 4 // last byte — parquet footer territory
    Files.write(big.toPath, bytes)
    assert(LayoutCache.contentFingerprint(Seq(big)) != bfp1)
  }
}
