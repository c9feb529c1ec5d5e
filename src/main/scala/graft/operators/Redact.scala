package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.kernel.TextKernel

/** PII redaction for training-data pipelines: replace every DETECTED AND
  * VALIDATED pattern occurrence (CPF/CNPJ checksums, calendar-valid dates,
  * RFC-ish emails, phones, CEPs, currency, URLs, case numbers — the
  * kernel's F4 table, text_processor.py:405-436) with a typed placeholder
  * `[TYPE]`.
  *
  * Validation-aware redaction is what the regex-only approach gets wrong:
  * an invalid CPF (failed check digit) is NOT PII and is left intact,
  * exactly matching the reference's detection semantics.
  */
object Redact {

  /** Pure kernel form: (redacted text, counts per type). Detection runs on
    * the text as-is (canonical formatting applied first, like the
    * reference's in-place reformat).
    */
  def redactText(kernel: TextKernel, text: String): (String, Map[String, Int]) = {
    val (formatted, found) = kernel.detectAndFormatPatterns(text)
    var out = formatted
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    found.foreach { case (ptype, matches) =>
      val tag = s"[${ptype.toUpperCase(java.util.Locale.ROOT)}]"
      matches.foreach { m =>
        if (out.contains(m)) {
          // replace ALL occurrences of this validated match
          var c = 0
          var idx = out.indexOf(m)
          while (idx >= 0) { c += 1; idx = out.indexOf(m, idx + m.length) }
          out = out.replace(m, tag)
          counts.update(ptype, counts.getOrElse(ptype, 0) + c)
        }
      }
    }
    (out, counts.toMap)
  }

  final case class Redacted(id: Long, text_redacted: String, redactions: Map[String, Int])

  /** Distributed form: pooled kernel per partition (narrow map). */
  def redact(df: DataFrame, idCol: String, textCol: String): Dataset[Redacted] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val kernel = new TextKernel
        it.map { case (id, text) =>
          val (red, counts) = redactText(kernel, Option(text).getOrElse(""))
          Redacted(id, red, counts)
        }
      }
  }
}
