package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Scala discount mirror ([[BenchReport.discountedEntries]],
  * which stamps `discounted`/`discounted_n` into the bench contract
  * line) to the Python adjudicator (`scripts/adjudicate_bench.py`,
  * which writes each round's ADJUDICATION_r{N}.md) over the REAL
  * committed artifacts — not synthetic fixtures. Round 9 shipped one
  * artifact whose contract line said `discounted_n: 2` beside a
  * self-adjudication saying 1 (r9 verdict ask #3); this spec makes any
  * such divergence a red test: for every committed BENCH_r{N}.json
  * whose diag evidence exists, the two implementations must produce
  * the IDENTICAL discount set from the identical evidence.
  *
  * Both sides are fed the same inputs the adjudicator uses at
  * adjudication time: history floors computed over bench_diag/ MINUS
  * the run under adjudication (via [[Bench.diagFloors]]'s
  * excludeRunId, the Scala twin of the script's history rule) and the
  * diag-stamped nominal. At bench time the in-process mirror sees the
  * same floors by construction — its own diag file isn't written when
  * floors load — so run-end self-adjudication and the contract line
  * agree too.
  */
class AdjudicationParitySpec extends AnyFunSuite {

  import org.json4s._
  import org.json4s.jackson.JsonMethods.parse

  private def nums(v: JValue): Seq[Double] = v match {
    case JArray(xs) => xs.collect {
      case JDouble(d) => d
      case JInt(i) => i.toDouble
      case JDecimal(d) => d.toDouble
    }
    case _ => Nil
  }
  private def longs(v: JValue): Seq[Long] = v match {
    case JArray(xs) => xs.collect {
      case JInt(i) => i.toLong
      case JLong(l) => l
      case JDouble(d) => d.toLong
    }
    case _ => Nil
  }
  private def dbl(v: JValue): Double = v match {
    case JDouble(d) => d
    case JInt(i) => i.toDouble
    case JDecimal(d) => d.toDouble
    case _ => -1.0
  }

  private def pythonDiscounts(benchFile: String): Option[Set[String]] =
    try {
      val p = new ProcessBuilder("python3", "scripts/adjudicate_bench.py",
        benchFile, "--json").start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      if (p.waitFor() != 0) None
      else parse(out.linesIterator.toSeq.last) \ "discounted" match {
        case JArray(xs) => Some(xs.collect { case JString(s) => s }.toSet)
        case _ => None
      }
    } catch { case _: Throwable => None }

  private def scalaDiscounts(benchFile: String): Option[Set[String]] = {
    val raw = parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(benchFile)), "UTF-8"))
    // the driver's BENCH_r{N}.json wraps the contract line under
    // "parsed" (beside rc/tail/...), same unwrap as load_contract
    val contract = raw \ "queries" match {
      case JObject(_) => raw
      case _ => raw \ "parsed"
    }
    val runId = contract \ "run_id" match {
      case JInt(i) => i.toLong
      case JLong(l) => l
      case _ => return None
    }
    val diagPath = java.nio.file.Paths.get("bench_diag", s"run_$runId.json")
    if (!java.nio.file.Files.exists(diagPath)) return None
    val diag = parse(new String(
      java.nio.file.Files.readAllBytes(diagPath), "UTF-8"))
    val sf = contract \ "sf" match {
      case JString(s) => Some(s)
      case _ => None
    }
    val (taskFloors, wallFloors) = Bench.diagFloors(
      java.nio.file.Paths.get("bench_diag"), sf, Some(runId))
    val nominal = dbl(diag \ "nominal_par_ms")
    val results: Seq[(String, Double)] = contract \ "queries" match {
      case JObject(fields) => fields.map { case (k, v) => k -> dbl(v) }
      case _ => return None
    }
    val rawRuns = (diag \ "runs" match {
      case JObject(fields) => fields.map { case (k, v) => k -> nums(v) }
      case _ => Nil
    }).toMap
    val env = (diag \ "host_env" match {
      case JObject(fields) => fields.map { case (entry, v) =>
        entry -> BenchReport.EntryEnv(Nil, Nil, Nil, Nil,
          taskSec = nums(v \ "task_sec"),
          janino = longs(v \ "janino_compiles"),
          canaryParMs = nums(v \ "canary_par_ms"),
          taskFloor = taskFloors.getOrElse(entry, -1.0),
          wallFloor = wallFloors.getOrElse(entry, -1.0))
      }
      case _ => Nil
    }).toMap
    Some(BenchReport.discountedEntries(results, rawRuns, env, nominal)
      .toSet)
  }

  test("mirror and adjudicator agree on every committed BENCH_r{N}.json") {
    import scala.jdk.CollectionConverters._
    val re = "BENCH_r(\\d+)\\.json".r
    val stream = java.nio.file.Files.list(java.nio.file.Paths.get("."))
    val benchFiles =
      try stream.iterator().asScala.map(_.getFileName.toString)
        .filter(re.matches(_)).toList.sorted
      finally stream.close()
    // records from before the round-7 witness panel carry no run_id /
    // diag and cannot be adjudicated by either side — skip those, but
    // require at least one adjudicable record so this spec can't
    // silently pass by matching nothing
    val adjudicable = benchFiles.flatMap { f =>
      scalaDiscounts(f).map(f -> _)
    }
    assume(adjudicable.nonEmpty,
      "no committed BENCH_r{N}.json with diag evidence in this worktree")
    adjudicable.foreach { case (f, mirror) =>
      val script = pythonDiscounts(f)
      assume(script.isDefined, s"python3 unavailable for $f")
      assert(mirror === script.get,
        s"$f: Scala mirror and Python adjudicator disagree")
    }
  }
}
