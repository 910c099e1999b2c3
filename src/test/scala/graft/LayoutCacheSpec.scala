package graft

import java.io.File
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import graft.sources.LayoutCache

/** Contract tests for the cross-JVM layout cache: atomic publish,
  * builder serialization, torn-write recovery, content fingerprinting,
  * stale-sibling sweep. Pure filesystem — no Spark session needed. */
class LayoutCacheSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def tmpBase(): File =
    Files.createTempDirectory("layout_cache_spec").toFile

  private def writeLayout(dir: String, payload: String = "data"): Unit = {
    val d = new File(dir)
    d.mkdirs()
    Files.writeString(new File(d, "part-0").toPath, payload)
    Files.writeString(new File(d, "_SUCCESS").toPath, "")
    ()
  }

  test("builds once, reuses on subsequent calls") {
    val base = tmpBase()
    val builds = new AtomicInteger(0)
    val p1 = LayoutCache.ensure("lay", "src", "aaaa", base) { tmp =>
      builds.incrementAndGet(); writeLayout(tmp)
    }
    val p2 = LayoutCache.ensure("lay", "src", "aaaa", base) { tmp =>
      builds.incrementAndGet(); writeLayout(tmp)
    }
    assert(p1 == p2)
    assert(builds.get() == 1)
    assert(new File(p1, "_SUCCESS").exists())
    assert(Files.readString(new File(p1, "part-0").toPath) == "data")
  }

  test("a destination without _SUCCESS (torn legacy write) is rebuilt") {
    val base = tmpBase()
    val torn = new File(base, "lay_src_bbbb")
    torn.mkdirs()
    Files.writeString(new File(torn, "part-0").toPath, "partial")
    val p = LayoutCache.ensure("lay", "src", "bbbb", base)(writeLayout(_, "fresh"))
    assert(Files.readString(new File(p, "part-0").toPath) == "fresh")
    assert(new File(p, "_SUCCESS").exists())
  }

  test("a builder that crashes leaves no destination; the next builder succeeds") {
    val base = tmpBase()
    intercept[RuntimeException] {
      LayoutCache.ensure("lay", "src", "cccc", base) { tmp =>
        new File(tmp).mkdirs()
        Files.writeString(new File(tmp, "part-0").toPath, "half")
        throw new RuntimeException("writer crash")
      }
    }
    assert(!new File(base, "lay_src_cccc").exists(),
      "a crashed builder must not surface any destination directory")
    val p = LayoutCache.ensure("lay", "src", "cccc", base)(writeLayout(_, "retry"))
    assert(Files.readString(new File(p, "part-0").toPath) == "retry")
    // the crashed builder's .tmp-* orphan was swept by the retry
    val orphans = base.listFiles().filter(_.getName.contains(".tmp-"))
    assert(orphans.isEmpty, s"orphan tmp dirs remain: ${orphans.mkString(",")}")
  }

  test("a writer that omits _SUCCESS is refused publication") {
    val base = tmpBase()
    intercept[IllegalArgumentException] {
      LayoutCache.ensure("lay", "src", "dddd", base) { tmp =>
        new File(tmp).mkdirs()
        Files.writeString(new File(tmp, "part-0").toPath, "no marker")
      }
    }
    assert(!new File(base, "lay_src_dddd").exists())
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
        LayoutCache.ensure("lay", "src", "eeee", base) { tmp =>
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

  test("stale-fingerprint siblings are swept when a new fingerprint builds") {
    val base = tmpBase()
    LayoutCache.ensure("lay", "src", "f001", base)(writeLayout(_))
    // sources regenerated → new fingerprint; old layout can never validate
    LayoutCache.ensure("lay", "src", "f002", base)(writeLayout(_))
    assert(!new File(base, "lay_src_f001").exists(), "stale layout must be swept")
    assert(new File(base, "lay_src_f002/_SUCCESS").exists())
    // a different prefix is untouched
    LayoutCache.ensure("other", "src", "f001", base)(writeLayout(_))
    LayoutCache.ensure("lay", "src", "f003", base)(writeLayout(_))
    assert(new File(base, "other_src_f001/_SUCCESS").exists())
  }

  test("different scopes coexist; a rebuild sweeps only its own scope") {
    val base = tmpBase()
    // three simultaneously-valid sources (sf0.001/sf0.01/sf0.1)
    LayoutCache.ensure("lay", "sf0.001", "a1", base)(writeLayout(_))
    LayoutCache.ensure("lay", "sf0.01", "b1", base)(writeLayout(_))
    LayoutCache.ensure("lay", "sf0.1", "c1", base)(writeLayout(_))
    assert(new File(base, "lay_sf0.001_a1/_SUCCESS").exists())
    assert(new File(base, "lay_sf0.01_b1/_SUCCESS").exists())
    assert(new File(base, "lay_sf0.1_c1/_SUCCESS").exists())
    // sf0.1 regenerated: only ITS stale layout is evicted
    LayoutCache.ensure("lay", "sf0.1", "c2", base)(writeLayout(_))
    assert(!new File(base, "lay_sf0.1_c1").exists())
    assert(new File(base, "lay_sf0.1_c2/_SUCCESS").exists())
    assert(new File(base, "lay_sf0.001_a1/_SUCCESS").exists(),
      "sibling scope evicted by another scope's rebuild")
    assert(new File(base, "lay_sf0.01_b1/_SUCCESS").exists())
  }

  test("content fingerprint tracks sampled bytes, not just size+mtime") {
    val base = tmpBase()
    val f = new File(base, "src.bin")
    Files.write(f.toPath, Array.fill[Byte](1024)(1))
    val fp1 = LayoutCache.contentFingerprint(Seq(f))
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
