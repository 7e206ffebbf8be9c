package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** [[FloorTool]]'s merge policy — the floor file is the bench
  * sentinel's evidence base, so its movement rules are pinned:
  * (1) without flags a batch floor never RAISES and a meter floor
  * never LOWERS (losing a clean detail can't silently mute the
  * sentinel); (2) `--allow-raise` / `--allow-lower` actually take the
  * new value (the round-18 advice finding: the flags fell through to
  * the clamp, so a legitimately slower query could NEVER update its
  * floor — a stale too-tight floor then flags noise forever and spams
  * in-process re-runs, the exact failure the tool exists to prevent);
  * (3) a detail that cannot prove itself clean is excluded. */
class FloorToolSpec extends AnyFunSuite {

  private def detail(r: Int, dir: java.nio.file.Path, q1: Double,
      meter: Double, control: Double, clean: Boolean = true): String = {
    val p = dir.resolve(s"BENCH_DETAIL_r$r.json")
    val body =
      s"""{"ok": ${clean}, "host_noise": [], "host_noise_suspected": false,
         | "queries": {"q1_pricing_summary": $q1},
         | "streaming": {"rows_per_sec": $meter},
         | "control": {"first": $control}}""".stripMargin
    Files.write(p, body.getBytes("UTF-8"))
    p.toString
  }

  private def floors(path: java.nio.file.Path): Map[String, Double] = {
    val txt = new String(Files.readAllBytes(path), "UTF-8")
    """"([A-Za-z0-9_]+)"\s*:\s*([0-9][0-9.]*)""".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  test("without flags: batch raise and meter lower are refused") {
    val dir = Files.createTempDirectory("graft-floors")
    val out = dir.resolve("floor.json")
    Files.write(out,
      """{"q1_pricing_summary": 0.300, "streaming_rows_per_sec": 100.0,
        |"control_first": 0.200}""".stripMargin.getBytes("UTF-8"))
    val d = detail(5, dir, q1 = 0.5, meter = 80.0, control = 0.4)
    FloorTool.main(Array("--out", out.toString, d))
    val f = floors(out)
    assert(f("q1_pricing_summary") == 0.3, s"batch raise must be refused: $f")
    assert(f("streaming_rows_per_sec") == 100.0, s"meter lower must be refused: $f")
    assert(f("control_first") == 0.2, s"control raise must be refused: $f")
  }

  test("--allow-raise takes the slower batch/control value; --allow-lower the slower meter") {
    val dir = Files.createTempDirectory("graft-floors-allow")
    val out = dir.resolve("floor.json")
    Files.write(out,
      """{"q1_pricing_summary": 0.300, "streaming_rows_per_sec": 100.0,
        |"control_first": 0.200}""".stripMargin.getBytes("UTF-8"))
    val d = detail(5, dir, q1 = 0.5, meter = 80.0, control = 0.4)
    FloorTool.main(Array("--out", out.toString, "--allow-raise", d))
    val f1 = floors(out)
    assert(f1("q1_pricing_summary") == 0.5,
      s"--allow-raise must take the new slower floor: $f1")
    assert(f1("control_first") == 0.4,
      s"--allow-raise must apply to the control floor too: $f1")
    assert(f1("streaming_rows_per_sec") == 100.0,
      s"--allow-raise must not touch meter floors: $f1")
    FloorTool.main(Array("--out", out.toString, "--allow-lower", d))
    val f2 = floors(out)
    assert(f2("streaming_rows_per_sec") == 80.0,
      s"--allow-lower must take the new slower meter floor: $f2")
  }

  test("floors still move in the strengthening direction without flags; unclean details excluded") {
    val dir = Files.createTempDirectory("graft-floors-dir")
    val out = dir.resolve("floor.json")
    Files.write(out,
      """{"q1_pricing_summary": 0.300, "streaming_rows_per_sec": 100.0}"""
        .getBytes("UTF-8"))
    // faster batch + faster meter: both move without any flag
    val d = detail(6, dir, q1 = 0.2, meter = 120.0, control = 0.1)
    FloorTool.main(Array("--out", out.toString, d))
    val f = floors(out)
    assert(f("q1_pricing_summary") == 0.2 && f("streaming_rows_per_sec") == 120.0)
    // an unclean detail (ok=false) must not count as evidence at all
    val bad = detail(7, dir, q1 = 0.05, meter = 500.0, control = 0.05,
      clean = false)
    assert(FloorTool.parseClean(bad).isEmpty,
      "a detail that cannot prove cleanliness must be excluded")
  }
}
