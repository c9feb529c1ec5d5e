package graft.pipeline

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.schema.Turn

/** Deterministic synthetic transcript table (BASELINE.json `input_hint`
  * schema), generated distributed via `spark.range(nConvs).flatMap`.
  *
  * The text generator (splitmix64 over a fixed fragment vocabulary) is
  * bit-identical to tools/gen_goldens.py, which runs the *reference*
  * implementation over the same texts — so pipeline outputs are verifiable
  * per turn against reference-produced goldens.
  *
  * Heavy tail: every 97th conversation is 50× the base size — the analog of
  * the reference's >50-page PDFs that force splitting
  * (OCR_Enhanced_with_Searchable_PDF_REAL.py:60,709-774) — to exercise
  * skew handling (salting, AQE).
  */
object TranscriptGen {

  /** splitmix64 — same constants as tools/gen_goldens.py sm64(). */
  def sm64(x0: Long): Long = {
    val x = x0 + 0x9E3779B97F4A7C15L
    var z = x
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  lazy val fragments: Array[String] = {
    val in = getClass.getResourceAsStream("/graft/fragments.json")
    require(in != null, "graft/fragments.json resource missing")
    val s = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    import org.json4s._
    org.json4s.jackson.JsonMethods.parse(s) match {
      case JArray(items) => items.map { case JString(f) => f; case other => sys.error(s"bad fragment $other") }.toArray
      case other         => sys.error(s"bad fragments.json: $other")
    }
  }

  private val tools = Array("search", "calculator", "code_interpreter", "browser")

  /** Matches tools/gen_goldens.py turn_text(). */
  def turnText(conv: Long, turn: Long): String = {
    val nf = fragments.length
    var s = sm64(conv * 0x9E3779B97F4A7C15L + turn)
    val k = 1 + (((s >>> 33) % 4)).toInt
    val parts = new Array[String](k)
    var i = 0
    while (i < k) {
      s = sm64(s)
      parts(i) = fragments(((s >>> 33) % nf).toInt)
      i += 1
    }
    parts.mkString(" ")
  }

  /** Matches tools/gen_goldens.py conv_turns(). */
  def convTurns(conv: Long): Int = {
    val base = 4 + ((sm64(conv * 31 + 7) >>> 33) % 28).toInt
    if (conv % 97 == 0) base * 50 else base
  }

  def roleAndTool(conv: Long, turn: Long): (String, String) = {
    val h = sm64(conv * 7919 + turn * 31 + 13)
    if ((h >>> 33) % 10 == 0) ("tool", tools(((h >>> 17) % tools.length).toInt))
    else if (turn % 2 == 0) ("user", "") else ("assistant", "")
  }

  private val baseEpoch = Instant.parse("2026-01-01T00:00:00Z").getEpochSecond

  def makeTurn(conv: Long, turn: Int): Turn = {
    val (role, tool) = roleAndTool(conv, turn)
    Turn(
      conv_id = f"conv$conv%08d",
      turn_idx = turn,
      role = role,
      text = turnText(conv, turn),
      tool = tool,
      ts = Timestamp.from(Instant.ofEpochSecond(baseEpoch + conv * 3600 + turn * 30L)))
  }

  /** Distributed generation: one range row per conversation, exploded to
    * turns inside flatMap (narrow; no shuffle). At 10^12-turn scale the
    * same shape holds — conversations parallelize across executors and the
    * giant-conv tail is handled downstream by salting, not here.
    */
  def dataset(spark: SparkSession, nConvs: Long, partitions: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    spark.range(0, nConvs, 1, p).flatMap { conv =>
      (0 until convTurns(conv)).iterator.map(t => makeTurn(conv, t))
    }
  }

  /** Total turn count without materializing (for bench reporting). */
  def totalTurns(nConvs: Long): Long =
    (0L until nConvs).iterator.map(convTurns(_).toLong).sum
}
