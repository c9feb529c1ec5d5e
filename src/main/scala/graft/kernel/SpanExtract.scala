package graft.kernel

import java.util.regex.Pattern
import scala.collection.mutable.ListBuffer

/** An extracted field with its character-offset span into the cleaned text.
  * Mirrors FieldExtractor.extract's return shape
  * (reference src/automation/templates.py:69-97): value, confidence,
  * position = match.span(), raw_match.
  */
final case class FieldSpan(
    name: String, value: String, confidence: Double, start: Int, end: Int,
    raw: String)

/** Field types (templates.py:34-44) — only the processing-relevant subset. */
object FieldType extends Enumeration {
  val Text, Number, Currency, Date, Email, Phone = Value
}

/** Port of `FieldExtractor` (templates.py:47-197): first valid match of any
  * pattern wins; type-specific value normalization; confidence = 0.8 with
  * length and ±50-char context-keyword adjustments.
  */
final class FieldExtractor(
    val name: String,
    val fieldType: FieldType.Value,
    patternStrs: Seq[String],
    validationRegex: Option[String] = None) {
  import Py._

  private val patterns: Seq[Pattern] =
    patternStrs.map(p => Pattern.compile(p, IFLAGS | Pattern.MULTILINE))
  private val validation: Option[Pattern] =
    validationRegex.map(r => Pattern.compile(r))

  // type-specific helpers (templates.py:99-152)
  private val pNonNumeric = compile("""[^\d.,]""")
  private val pAmount = compile("""[\d.,]+""")
  private val pCurrencySym = compile("""[R$€£¥₹]+|USD|EUR|BRL|GBP""")
  private val pDate1 = compile("""(\d{1,2})[\/\-.](\d{1,2})[\/\-.](\d{2,4})""")
  private val pDate2 = compile("""(\d{2,4})[\/\-.](\d{1,2})[\/\-.](\d{1,2})""")
  private val pEmail = compile("""\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b""")
  private val pPhoneClean = compile("""[^\d+\-\(\)\s]""")

  private val contextKeywords: Seq[String] = fieldType match {
    case FieldType.Currency => Seq("total", "amount", "price", "valor", "preço")
    case FieldType.Date     => Seq("date", "data", "vencimento", "due")
    case FieldType.Email    => Seq("email", "e-mail", "contact", "contato")
    case FieldType.Phone    => Seq("phone", "telefone", "tel", "celular")
    case _                  => Seq.empty
  }

  def extract(text: String): Option[FieldSpan] = {
    patterns.foreach { p =>
      val m = p.matcher(text)
      while (m.find()) {
        processMatch(m).foreach { value =>
          if (value.nonEmpty && validate(value)) {
            return Some(FieldSpan(name, value,
              calculateConfidence(m.group(), m.start(), m.end(), text),
              m.start(), m.end(), m.group()))
          }
        }
      }
    }
    None
  }

  private def processMatch(m: java.util.regex.Matcher): Option[String] = {
    val raw = if (m.groupCount() > 0) Option(m.group(1)).getOrElse(m.group())
              else m.group()
    val value = strip(raw)
    fieldType match {
      case FieldType.Number =>
        val numeric = subLiteral(pNonNumeric, "", value).replace(',', '.')
        if (numeric.nonEmpty) Some(numeric) else None
      case FieldType.Currency =>
        search(pAmount, value) match {
          case Some(am) =>
            val amount = am.group().replace(',', '.')
            val currency = search(pCurrencySym, value).map(_.group()).getOrElse("")
            Some(strip(s"$amount $currency"))
          case None => None
        }
      case FieldType.Date =>
        search(pDate1, value).map(_.group())
          .orElse(search(pDate2, value).map(_.group()))
          .orElse(Some(value))
      case FieldType.Email =>
        search(pEmail, value).map(_.group())
      case FieldType.Phone =>
        val phone = strip(subLiteral(pPhoneClean, "", value))
        if (phone.nonEmpty) Some(phone) else None
      case _ => Some(value)
    }
  }

  private def validate(value: String): Boolean =
    validation.forall(p => p.matcher(value).lookingAt())

  /** templates.py:167-197 */
  private def calculateConfidence(
      group: String, start: Int, end: Int, fullText: String): Double = {
    var conf = 0.8
    val len = pyLen(group)
    if (len > 50) conf += 0.1
    else if (len < 5) conf -= 0.1
    val ctxStart = math.max(0, start - 50)
    val ctxEnd = math.min(fullText.length, end + 50)
    val context = lower(fullText.substring(ctxStart, ctxEnd))
    if (contextKeywords.exists(context.contains)) conf += 0.05
    math.min(1.0, math.max(0.0, conf))
  }
}

/** A document template: identification patterns + field extractors.
  * Port of `DocumentTemplate` (templates.py:226-298) with the three
  * built-ins from `TemplateManager._load_builtin_templates`
  * (templates.py:376-526).
  */
final class SpanTemplate(
    val name: String,
    identificationPatterns: Seq[String],
    val fields: Seq[FieldExtractor],
    val confidenceThreshold: Double = 0.8) {

  private val compiled: Seq[Pattern] =
    identificationPatterns.map(p =>
      Pattern.compile(p, Py.IFLAGS | Pattern.MULTILINE))

  /** fraction of identification patterns matching (templates.py:266-279) */
  def matchesDocument(text: String): Double =
    if (compiled.isEmpty) 0.0
    else compiled.count(_.matcher(text).find()).toDouble / compiled.size

  def extractFields(text: String): Seq[FieldSpan] = {
    val out = ListBuffer.empty[FieldSpan]
    fields.foreach(f => f.extract(text).foreach(out += _))
    out.toSeq
  }
}

object SpanTemplates {
  import FieldType._

  val invoice = new SpanTemplate(
    "Brazilian Invoice",
    Seq("""nota\s+fiscal""", """nfe""", """cnpj""", """valor\s+total""",
      """fatura"""),
    Seq(
      new FieldExtractor("invoice_number", Text, Seq(
        """n[úu]mero\s*:?\s*(\d+)""",
        """nf\s*:?\s*(\d+)""",
        """nota\s+fiscal\s*:?\s*(\d+)""")),
      new FieldExtractor("total_amount", Currency, Seq(
        """total\s*:?\s*(r?\$?\s*[\d.,]+)""",
        """valor\s+total\s*:?\s*(r?\$?\s*[\d.,]+)""")),
      new FieldExtractor("issue_date", Date, Seq(
        """data\s+de\s+emiss[ãa]o\s*:?\s*(\d{1,2}[\/\-]\d{1,2}[\/\-]\d{2,4})""",
        """emitida\s+em\s*:?\s*(\d{1,2}[\/\-]\d{1,2}[\/\-]\d{2,4})""")),
      new FieldExtractor("cnpj", Text, Seq(
        """cnpj\s*:?\s*(\d{2}\.?\d{3}\.?\d{3}\/?\d{4}\-?\d{2})"""),
        validationRegex = Some("""\d{2}\.?\d{3}\.?\d{3}\/?\d{4}\-?\d{2}"""))))

  val businessCard = new SpanTemplate(
    "Business Card",
    Seq("""@\w+\.\w+""", """\(\d{2}\)\s*\d{4,5}\-?\d{4}""", """cel\.|celular""",
      """fone|telefone"""),
    Seq(
      new FieldExtractor("name", Text, Seq(
        """^([A-Z][a-z]+\s+[A-Z][a-z]+.*?)$""")),
      new FieldExtractor("email", Email, Seq(
        """([a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,})""")),
      new FieldExtractor("phone", Phone, Seq(
        """(\(\d{2}\)\s*\d{4,5}\-?\d{4})""",
        """(\d{2}\s*\d{4,5}\-?\d{4})""")),
      new FieldExtractor("company", Text, Seq(
        """([A-Z][a-zA-Z\s&]+(?:Ltda|S\.A\.|Inc|Corp)\.?)"""))))

  val receipt = new SpanTemplate(
    "Receipt",
    Seq("""cupom\s+fiscal""", """recibo""", """comprovante""",
      """total\s+pago"""),
    Seq(
      new FieldExtractor("total_paid", Currency, Seq(
        """total\s*:?\s*(r?\$?\s*[\d.,]+)""",
        """pago\s*:?\s*(r?\$?\s*[\d.,]+)""")),
      new FieldExtractor("establishment", Text, Seq(
        """^([A-Z\s&]+)$""")),
      new FieldExtractor("date_time", Date, Seq(
        """(\d{1,2}[\/\-]\d{1,2}[\/\-]\d{2,4}\s+\d{1,2}:\d{2})"""))))

  /** registration order matters for tie-breaks (templates.py:521-524) */
  val all: Seq[SpanTemplate] = Seq(invoice, businessCard, receipt)

  /** best template with confidence >= its threshold, strictly improving —
    * TemplateManager.identify_document_type (templates.py:578-595)
    */
  def identify(text: String): Option[SpanTemplate] = {
    var best: Option[SpanTemplate] = None
    var bestConf = 0.0
    all.foreach { t =>
      val c = t.matchesDocument(text)
      if (c > bestConf && c >= t.confidenceThreshold) {
        bestConf = c
        best = Some(t)
      }
    }
    best
  }

  /** spans for a cleaned turn text: best-matching template's fields */
  def extract(text: String): Seq[FieldSpan] =
    identify(text).map(_.extractFields(text)).getOrElse(Seq.empty)
}
