package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths, Path}

/** tools/make_records.py guards the retry rig's records file — a bad
  * ratchet poisons every subsequent run's adjudication (run 53: 38
  * retries against records ratcheted from one exceptional window).
  * These specs run the real script in a sandbox copy so the r17
  * guards (healthy-run refusal, provenance, history pruning) are
  * pinned by execution, not prose. */
class ToolsSpec extends AnyFunSuite {

  private val python = Seq("/usr/bin/python3", "/usr/local/bin/python3")
    .find(p => new java.io.File(p).canExecute)

  /** Copy the script into a fresh temp dir (it writes relative to its
    * own location) and run it there; returns (exitCode, stdout+err). */
  private def runScript(dir: Path, args: Seq[String]): (Int, String) = {
    val pb = new ProcessBuilder(
      (Seq(python.get, dir.resolve("make_records.py").toString) ++ args): _*)
    pb.directory(dir.toFile)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    (proc.waitFor(), out)
  }

  private def sandbox(): Path = {
    val dir = Files.createTempDirectory("graft_tools_spec")
    Files.copy(Paths.get("tools/make_records.py"),
      dir.resolve("make_records.py"))
    dir
  }

  private def write(dir: Path, name: String, text: String): Path = {
    val p = dir.resolve(name)
    Files.writeString(p, text)
    p
  }

  test("a baro-violating BENCH_FULL is refused; --force overrides") {
    assume(python.isDefined, "python3 not on this host")
    val dir = sandbox()
    val full = write(dir, "BENCH_FULL.json",
      """{"queries":{"a_query":2.00},"failed":[],""" +
        """"baro_viol":["st_pre_q69_grouped_quantiles"],""" +
        """"barometers":{"st_pre_q69_grouped_quantiles":4.10}}""")
    val (rc, out) = runScript(dir, Seq("--run-id", "run9", full.toString))
    assert(rc != 0, s"expected refusal, got: $out")
    assert(out.contains("REFUSED") && out.contains("baro_viol"))
    assert(!Files.exists(dir.resolve("bench_records.json")),
      "a refused run must not write records")
    // …but the drifted run's barometers ARE history: the log append
    // is not gated on health (drift is what the history documents).
    val hist = Files.readString(dir.resolve("baro_history.json"))
    assert(hist.contains("run9") && hist.contains("drifted"))
    val (rc2, _) = runScript(dir, Seq("--force", full.toString))
    assert(rc2 == 0)
    val forced = Files.readString(dir.resolve("bench_records.json"))
    assert(forced.contains("FORCED"),
      "a forced ratchet must record the override in provenance")
  }

  test("failed queries also block the ratchet") {
    assume(python.isDefined, "python3 not on this host")
    val dir = sandbox()
    val full = write(dir, "BENCH_FULL.json",
      """{"queries":{"a_query":2.00},"failed":["b_query"],"baro_viol":[]}""")
    val (rc, out) = runScript(dir, Seq(full.toString))
    assert(rc != 0 && out.contains("REFUSED"), out)
  }

  test("healthy ratchet: element-wise min, provenance, history append") {
    assume(python.isDefined, "python3 not on this host")
    val dir = sandbox()
    val full = write(dir, "BENCH_FULL.json",
      """{"queries":{"a_query":2.00,"b_query":1.00},"failed":[],""" +
        """"baro_viol":[],"barometers":{""" +
        """"d_pre_q69_grouped_quantiles":1.80,""" +
        """"d_pre_d02_minhash_lsh":2.40,""" +
        """"d_post_q69_grouped_quantiles":1.50}}""")
    val (rc, out) = runScript(dir, Seq("--run-id", "run1", full.toString))
    assert(rc == 0, out)
    val recs = Files.readString(dir.resolve("bench_records.json"))
    assert(recs.contains(""""a_query":2.0""") &&
      recs.contains(""""b_query":1.0"""))
    assert(recs.contains("run_id=run1") && recs.contains("baro_viol=0"))
    // records only ratchet DOWN: a slower healthy run must not raise
    val slower = write(dir, "BENCH_FULL2.json",
      """{"queries":{"a_query":3.00},"failed":[],"baro_viol":[]}""")
    val (rc2, _) = runScript(dir, Seq(slower.toString))
    assert(rc2 == 0)
    assert(Files.readString(dir.resolve("bench_records.json"))
      .contains(""""a_query":2.0"""))
    // the history got run1's barometers, grouped per child
    val hist = Files.readString(dir.resolve("baro_history.json"))
    assert(hist.contains("run1") && hist.contains("pre_q69") &&
      hist.contains("1.8"))
  }

  test("--run-id with multiple inputs is refused (history overwrite)") {
    assume(python.isDefined, "python3 not on this host")
    val dir = sandbox()
    val a = write(dir, "A.json",
      """{"queries":{"a_query":2.00},"failed":[],"baro_viol":[],""" +
        """"barometers":{"d_pre_q69_grouped_quantiles":1.80}}""")
    val b = write(dir, "B.json",
      """{"queries":{"a_query":2.00},"failed":[],"baro_viol":[],""" +
        """"barometers":{"d_pre_q69_grouped_quantiles":1.90}}""")
    // r17 ADVICE: each file's append would overwrite hist[run_id] and
    // silently keep only the last file's barometers.
    val (rc, out) = runScript(dir,
      Seq("--run-id", "run5", a.toString, b.toString))
    assert(rc != 0 && out.contains("REFUSED"), out)
    assert(!Files.exists(dir.resolve("baro_history.json")),
      "a refused multi-input run must not write history")
    // without --run-id, multiple inputs still ratchet fine
    val (rc2, out2) = runScript(dir, Seq(a.toString, b.toString))
    assert(rc2 == 0, out2)
  }

  test("a summary line without a queries map never ratchets its keys") {
    assume(python.isDefined, "python3 not on this host")
    val dir = sandbox()
    // r17 ADVICE: the bare-flat-map fallback used to ratchet the
    // summary's own numeric keys (value/n/retried/...) into
    // bench_records.json as bogus permanent records.
    val summary = write(dir, "S.json",
      """{"metric":"total","unit":"sec","value":785.78,"n":411,""" +
        """"failed":[],"baro_viol":0,"retried":107,"unadjudicated":0}""")
    val (rc, out) = runScript(dir, Seq(summary.toString))
    assert(rc != 0 && out.contains("REFUSED") && out.contains("summary"),
      out)
    assert(!Files.exists(dir.resolve("bench_records.json")))
    // a genuine bare flat map (no marker keys) still works
    val bare = write(dir, "BARE.json", """{"a_query":1.50,"b_query":0.75}""")
    val (rc2, out2) = runScript(dir, Seq(bare.toString))
    assert(rc2 == 0, out2)
    val recs = Files.readString(dir.resolve("bench_records.json"))
    assert(recs.contains(""""a_query":1.5""") &&
      recs.contains(""""b_query":0.75"""))
  }

  test("history prunes to the retention window, keeps non-run keys") {
    assume(python.isDefined, "python3 not on this host")
    val dir = sandbox()
    val seeded = (1 to 21).map(i =>
      s""""run$i":{"d":{"pre_q69":1.80},"verdict":"healthy"}""")
      .mkString(",")
    write(dir, "baro_history.json", s"""{"_doc":"kept",$seeded}""")
    val full = write(dir, "BENCH_FULL.json",
      """{"queries":{"a_query":1.00},"failed":[],"baro_viol":[],""" +
        """"barometers":{"d_pre_q69_grouped_quantiles":1.70}}""")
    val (rc, out) = runScript(dir, Seq("--run-id", "run22", full.toString))
    assert(rc == 0, out)
    val hist = Files.readString(dir.resolve("baro_history.json"))
    assert(hist.contains("\"_doc\""), "_doc must survive pruning")
    assert(hist.contains("\"run22\""), "the new run must be present")
    assert(!hist.contains("\"run1\":"), "oldest runs beyond the window prune")
    assert(!hist.contains("\"run2\":"))
    assert(hist.contains("\"run3\":"), "runs inside the window stay")
  }
}
