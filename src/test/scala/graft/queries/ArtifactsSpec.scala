package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pins the /tmp hygiene contract of [[Artifacts]] (ADVICE r15): a
  * SIGKILLed JVM never runs its exit hook, so its per-PID artifact dirs
  * are reclaimed by the NEXT process touching the same prefix — while a
  * live concurrent process's dirs are never touched. */
class ArtifactsSpec extends AnyFunSuite {

  private def mkDirWithFile(p: java.io.File): Unit = {
    assert(p.mkdirs(), s"mkdirs failed: $p")
    java.nio.file.Files.writeString(p.toPath.resolve("part-0"), "x")
    ()
  }

  test("first touch of a prefix sweeps dead-pid siblings, keeps live ones") {
    // unique prefix per test run so the sweep's first-touch memo fires
    val prefix = s"graft_test_sweep_${System.nanoTime()}"
    val parent = new java.io.File(s"/tmp/$prefix")
    // a pid that cannot be alive: ProcessHandle.of rejects pids beyond
    // the OS max, and 2^22 (linux default pid_max) + our offset is free
    // on any sane box — verify liveness anyway to keep the test honest
    val deadPid = Iterator.iterate(4100000L)(_ + 1)
      .find(p => java.lang.ProcessHandle.of(p).isEmpty).get
    val livePid = java.lang.ProcessHandle.current().pid()
    val dead = new java.io.File(parent, s"sf0.01-abcd1234-p$deadPid")
    val live = new java.io.File(parent, s"sf0.01-abcd1234-p$livePid")
    val unowned = new java.io.File(parent, "not-a-pid-dir")
    mkDirWithFile(dead); mkDirWithFile(live); mkDirWithFile(unowned)

    val issuedPath = Artifacts.path(prefix, "/tmp/does-not-matter")

    assert(!dead.exists(), "dead-pid sibling should be swept")
    assert(live.exists(), "live-pid sibling must survive")
    assert(unowned.exists(), "non-pid-suffixed dirs are never touched")
    assert(issuedPath.startsWith(s"/tmp/$prefix/"),
      s"issued path outside the prefix parent: $issuedPath")
    // cleanup (the exit hook would also reclaim these, but keep /tmp tidy
    // for the rest of the suite run)
    Seq(live, unowned).foreach { d =>
      d.listFiles().foreach(_.delete()); d.delete()
    }
    ()
  }
}
