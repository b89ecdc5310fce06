package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** Concurrency contract of SparkEntry.cachedBuild (round-11 verdict #8):
  * the gate runs bench and spec processes in parallel, and both construct
  * queries whose artifacts share a digest directory — racing builders
  * must produce exactly one build and never a torn artifact.
  */
class CachedBuildSpec extends AnyFunSuite {

  private def newSrc(): java.nio.file.Path = {
    val src = Files.createTempDirectory("cb_src")
    Files.writeString(src.resolve("fixture.txt"), "fixture-bytes-v1")
    src
  }

  test("eight racing builders: one build, one untorn artifact, same path") {
    val src = newSrc()
    val outBase = Files.createTempDirectory("cb_out").toString
    val builds = new AtomicInteger(0)
    val barrier = new java.util.concurrent.CyclicBarrier(8)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val futures = (0 until 8).map { _ =>
      pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = {
          barrier.await()
          SparkEntry.cachedBuild(src.toString, "fixture.txt", outBase) {
            p =>
              builds.incrementAndGet()
              Files.createDirectories(Paths.get(p))
              Thread.sleep(200) // widen the race window
              Files.writeString(Paths.get(p, "data.txt"), "artifact")
          }
        }
      })
    }
    val outs = futures.map(_.get()).toSet
    pool.shutdown()
    assert(outs.size == 1, s"racing builders diverged on paths: $outs")
    assert(builds.get() == 1,
      s"expected exactly one build under the race, got ${builds.get()}")
    val out = outs.head
    assert(Files.readString(Paths.get(out, "data.txt")) == "artifact")
    assert(Files.exists(Paths.get(out, "_graft_sig")),
      "signature marker missing after the race")
  }

  test("a regenerated fixture rebuilds once; a crashed build leaves no marker") {
    val src = newSrc()
    val outBase = Files.createTempDirectory("cb_out2").toString
    val builds = new AtomicInteger(0)
    def run(): String =
      SparkEntry.cachedBuild(src.toString, "fixture.txt", outBase) { p =>
        builds.incrementAndGet()
        Files.createDirectories(Paths.get(p))
        Files.writeString(Paths.get(p, "data.txt"), s"build-${builds.get()}")
      }
    val out = run()
    assert(builds.get() == 1)
    assert(run() == out && builds.get() == 1, "second call must be cached")
    // regenerate the fixture (different length => different signature)
    Files.writeString(src.resolve("fixture.txt"), "fixture-bytes-v2-longer")
    run()
    assert(builds.get() == 2, "a regenerated fixture must rebuild")
    // a builder that dies mid-build must leave NO marker, so the next
    // caller rebuilds instead of reading a torn artifact
    Files.writeString(src.resolve("fixture.txt"), "fixture-bytes-v3-even-longer")
    intercept[RuntimeException] {
      SparkEntry.cachedBuild(src.toString, "fixture.txt", outBase) { _ =>
        throw new RuntimeException("simulated crash mid-build")
      }
    }
    assert(run() == out && builds.get() == 3,
      "after a crashed build the next caller must rebuild")
  }

  test("changed build params self-invalidate; stale output is cleared") {
    val src = newSrc()
    val outBase = Files.createTempDirectory("cb_out3").toString
    val builds = new AtomicInteger(0)
    def run(params: String): String =
      SparkEntry.cachedBuild(src.toString, "fixture.txt", outBase, params) {
        p =>
          builds.incrementAndGet()
          Files.createDirectories(Paths.get(p))
          Files.writeString(Paths.get(p, s"data-${builds.get()}.txt"),
            params)
      }
    val out = run("jaccard=0.7:w=3")
    assert(builds.get() == 1)
    assert(run("jaccard=0.7:w=3") == out && builds.get() == 1,
      "same params + same fixture must stay cached")
    // an operator-parameter change (the round-13 simgraph hazard: edit
    // the Jaccard threshold, forget the salt) must rebuild by itself...
    val out2 = run("jaccard=0.8:w=3")
    assert(builds.get() == 2, "changed params must self-invalidate")
    assert(out2 == out, "params do not move the artifact path")
    // ...and the rebuild must CLEAR the previous build's output first —
    // a mixed-generation dir would serve build-1 files alongside build-2
    assert(!Files.exists(Paths.get(out2, "data-1.txt")),
      "stale output from the previous params must be cleared on rebuild")
    assert(Files.readString(Paths.get(out2, "data-2.txt")) ==
      "jaccard=0.8:w=3")
  }
}
