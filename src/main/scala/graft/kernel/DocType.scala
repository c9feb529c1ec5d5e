package graft.kernel

import java.util.regex.Pattern

/** Per-block content classifier.
  *
  * Port of `XMLOutputGenerator._detectar_tipo_documento`
  * (reference src/utils/xml_output_generator.py:66-119): count regex hits
  * per document-type pattern family over the lowercased text; the
  * best-scoring family wins if it has >= 2 hits, else `documento_generico`.
  * Ties break by family order (Python dict insertion order).
  */
object DocType {
  import Py._

  private def ps(rs: String*): Seq[Pattern] = rs.map(compile)

  private val families: Seq[(String, Seq[Pattern])] = Seq(
    "manifestacao_processual" -> ps(
      """manifestação""",
      """excelentíssimo""",
      """meritíssimo""",
      """processo.*n[uú]mero""",
      """requerente""",
      """requerido""",
      """vara.*cível""",
      """tribunal.*justiça"""),
    "relatorio_administrador" -> ps(
      """relatório.*administrador""",
      """recuperação.*judicial""",
      """administrador.*judicial""",
      """quadro.*credores""",
      """passivo.*ativo""",
      """oab.*\d+""",
      """irresignação"""),
    "quadro_credores" -> ps(
      """quadro.*geral.*credores""",
      """classificação.*credor""",
      """garantia.*real""",
      """quirografário""",
      """trabalhista""",
      """valor.*crédito"""))

  val Generic = "documento_generico"

  /** Longest `.*`-separated pure-literal segment of a pattern — a
    * mandatory substring of any match, so a `contains` miss proves the
    * regex cannot match (prefilter; semantics unchanged). "" = no literal
    * segment, always run the regex.
    */
  private def requiredLiteral(src: String): String = {
    // a `.*`-separated literal segment is mandatory ONLY in a pattern with
    // no alternation/optionality at any level — bail out ("" = no
    // prefilter) if such metachars appear anywhere
    if (src.exists(c => c == '|' || c == '?' || c == '(' || c == '{')) return ""
    val lits = src.split("""\.\*""").filter(s =>
      s.nonEmpty && s.forall(c => Character.isLetter(c) || c == ' '))
    if (lits.isEmpty) "" else lits.maxBy(_.length)
  }

  private val familiesWithLits: Seq[(String, Seq[(Pattern, String)])] =
    families.map { case (name, pats) =>
      name -> pats.map(p => (p, requiredLiteral(p.pattern())))
    }

  def classify(text: String): String = {
    // null degrades to the generic family (the kernel tier's null
    // convention, like Sections/Chunker): a null text row reaching
    // classifyConversations must not kill the task
    if (text == null) return Generic
    val lowered = lower(text)
    val scores = familiesWithLits.map { case (name, pats) =>
      name -> pats.count { case (p, lit) =>
        (lit.isEmpty || lowered.contains(lit)) && p.matcher(lowered).find()
      }
    }
    val maxScore = scores.map(_._2).max
    if (maxScore >= 2) scores.find(_._2 == maxScore).get._1
    else Generic
  }
}
