package graft.operators

import graft.SparkSpec

/** REAL-JVM death coverage for the bucketed signature store's
  * file-targeted reclaim (`Bucketing.reclaimFromTable`) — the
  * SplitCrashSpec/RoutedMergeCrashSpec discipline applied to the r15
  * mutation: the protocol is append-then-delete, so its death windows
  * are (a) survivors appended, NO original deleted — the store reads
  * duplicate survivor rows while the standing tombstones (and the
  * never-appended R record) keep the targets hidden — and (b)
  * survivors appended, SOME originals deleted. A `graft.tools
  * .CrashWriter sigreclaim-*` process seeds the store, drives the
  * real plan/append/delete steps to the window, and halt(137)s
  * (genuinely dead: no shutdown hooks, no finally blocks); a SECOND
  * fresh process re-registers the surviving files as external
  * bucketed tables (the in-memory catalog died with the writer — the
  * files are the state), re-runs the reclaim as the heal, and audits
  * the net store against the fixture: every target physically gone
  * and re-opened, zero duplicate rows in either table, net-state
  * audit clean. The in-process crash-window test in SigUpsertSpec
  * simulates these disk states; this spec proves the simulation
  * faithful. */
class SigReclaimCrashSpec extends SparkSpec {

  private def tmpWh(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** run CrashWriter in a REAL separate JVM. */
  private def runCrashWriter(dir: String, mode: String): Int = {
    val addOpens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
      "java.io", "java.net", "java.nio", "java.util",
      "java.util.concurrent", "java.util.concurrent.atomic",
      "sun.nio.ch", "sun.nio.cs", "sun.security.action",
      "sun.util.calendar").flatMap(p =>
      Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    val cmd = Seq("java", "-XX:+IgnoreUnrecognizedVMOptions") ++
      addOpens ++ Seq("-Xmx2g", "-cp", sys.props("java.class.path"),
      "graft.tools.CrashWriter", dir, mode)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val drain = new Thread(() => {
      val buf = new Array[Byte](8192)
      while (p.getInputStream.read(buf) >= 0) ()
    })
    drain.setDaemon(true); drain.start()
    p.waitFor()
  }

  private def crashThenHeal(window: String): Unit = {
    val wh = tmpWh(s"sigrc-$window")
    assert(runCrashWriter(wh, s"sigreclaim-die-$window") === 137,
      "the crash process must die at the window, not exit cleanly")
    // the crashed state is on disk: sigs table holds appended survivor
    // copies alongside (some of) the originals; heal in a FRESH JVM
    assert(runCrashWriter(wh, "sigreclaim-verify") === 0,
      "the verify process must complete")
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(wh, "verify.json")), "UTF-8")
    assert(json.contains("\"healed\":3"),
      s"the heal must reclaim all three targets: $json")
    assert(json.contains("\"audit_ok\":true"),
      s"net-state audit must be clean after the heal: $json")
    assert(json.contains("\"dup_sigs\":0") &&
      json.contains("\"dup_bands\":0"),
      s"the heal must leave zero duplicate rows: $json")
  }

  test("die with survivors appended, originals intact: a real-JVM death heals on the re-run") {
    crashThenHeal("postappend")
  }

  test("die mid-delete (survivors appended, one original gone): a real-JVM death heals on the re-run") {
    crashThenHeal("middelete")
  }
}
