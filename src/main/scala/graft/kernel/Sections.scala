package graft.kernel

import java.util.regex.Pattern

import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

/** Section segmentation and text-table row extractors (SURVEY.md F11/F12;
  * xml_output_generator.py:344-476) — CPython-regex-faithful via Py.*.
  *
  * Pure Scala: used inside the extraction kernel / as UDF-backed array
  * columns + `explode` in operators.
  */
object Sections {

  final case class Section(name: String, text: String)
  final case class HistoryEvent(data: String, descricao: String)
  final case class CreditorRow(item: String, nome: String, valor: String, classificacao: String)

  // xml_output_generator.py:349-356 — searched against the LOWERCASED
  // paragraph, patterns themselves lowercase, insertion order significant
  // (first matching pattern wins via `break`).
  private val sectionPatterns: Seq[(String, Pattern)] = Seq(
    "dos_fatos" -> Py.compile("""(dos\s+fatos|fatos\s+e\s+fundamentos)"""),
    "do_direito" -> Py.compile("""(do\s+direito|fundamentos\s+jurídicos)"""),
    "dos_pedidos" -> Py.compile("""(dos\s+pedidos|pedidos)"""),
    "conclusao" -> Py.compile("""(conclus[aã]o|por\s+fim)"""),
    "introducao" -> Py.compile("""(introdu[çc][aã]o|preliminar)"""))

  /** F11 — split on blank lines, assign paragraphs to the current section;
    * a paragraph matching a section pattern STARTS that section
    * (xml_output_generator.py:344-373). Sections keep first-appearance
    * order; each accumulates `paragraph + "\n\n"`.
    */
  def split(texto: String): Seq[Section] = {
    if (texto == null) return Seq.empty
    val secoes = LinkedHashMap.empty[String, StringBuilder]
    var atual = "conteudo_principal"
    texto.split("\n\n", -1).foreach { paragrafo =>
      val lower = paragrafo.toLowerCase(java.util.Locale.ROOT)
      sectionPatterns.find { case (_, p) => p.matcher(lower).find() }
        .foreach { case (nome, _) => atual = nome }
      secoes.getOrElseUpdate(atual, new StringBuilder)
        .append(paragrafo).append("\n\n")
    }
    secoes.iterator.map { case (n, sb) => Section(n, sb.toString) }.toSeq
  }

  // xml_output_generator.py:380-385
  private val datePatterns: Seq[Pattern] = Seq(
    Py.compile("""(\d{2}/\d{2}/\d{4})"""),
    Py.compile("""(\d{2}-\d{2}-\d{4})"""),
    Py.compile("""(\d{4}-\d{2}-\d{2})"""))

  /** F12a — per-line date-tagged history events: first date pattern that
    * hits provides the date; the description is the line with ALL pattern
    * occurrences removed, stripped; empty descriptions are dropped
    * (xml_output_generator.py:375-401).
    */
  def historyEvents(texto: String): Seq[HistoryEvent] = {
    if (texto == null) return Seq.empty
    val out = ArrayBuffer.empty[HistoryEvent]
    texto.split("\n", -1).foreach { linha =>
      datePatterns.iterator
        .map(p => (p, p.matcher(linha)))
        .find(_._2.find())
        .foreach { case (p, m) =>
          val data = m.group(1)
          val descricao = Py.strip(p.matcher(linha).replaceAll(""))
          if (descricao.nonEmpty) out += HistoryEvent(data, descricao)
        }
    }
    out.toSeq
  }

  // xml_output_generator.py:447-452 — pedidos section then item split on
  // numbering/bullets; items <= 10 chars dropped.
  private val pedidosSection = Pattern.compile(
    """pedidos?[:\s]+(.*?)(?=\n\n[A-Z]|\n[A-Z][a-z]*:|\z)""",
    Py.IFLAGS | Pattern.DOTALL)
  private val pedidosSplit = Py.compile("""(?:^|\n)\s*(?:\d+\.?|\-|\*)\s*""")

  /** F12b — numbered/bulleted request-list extraction. */
  def pedidos(texto: String): Seq[String] = {
    if (texto == null) return Seq.empty
    val m = pedidosSection.matcher(texto)
    if (!m.find()) return Seq.empty
    pedidosSplit.split(m.group(1), -1).iterator
      .map(Py.strip)
      .filter(item => item.nonEmpty && item.length > 10)
      .toSeq
  }

  // xml_output_generator.py:462-476 — creditor-table row parse
  private val creditorRow = Pattern.compile(
    """(\d+)\s+([A-Z][^0-9]*?)\s+(\d+\.?\d*\.?\d*,\d{2})\s+(GARANTIA\s+REAL|QUIROGRAFÁRIO|TRABALHISTA|TRIBUTÁRIO)""",
    Py.IFLAGS)

  /** F12c — regex table parsing: (item, nome, valor, classificacao) rows. */
  def creditorRows(texto: String): Seq[CreditorRow] = {
    if (texto == null) return Seq.empty
    val m = creditorRow.matcher(texto)
    val out = ArrayBuffer.empty[CreditorRow]
    while (m.find())
      out += CreditorRow(m.group(1), Py.strip(m.group(2)), m.group(3), m.group(4))
    out.toSeq
  }

  // ---- header/field extractors used by the XML templates ----
  // (xml_output_generator.py:128-141 manifestação header, :165-186
  // relatório header, :217-226 situação, :403-439 descrição/irresignações)

  final case class Processo(numero: String, vara: String, comarca: String)
  final case class Administrador(nome: String, oab: String)
  final case class Irresignacao(
      id: String, nome: String, valor: String, classificacao: String)

  private val processoP =
    Py.compileI("""processo.*?n[uú]mero.*?(\d{7}-\d{2}\.\d{4}\.\d\.\d{2}\.\d{4})""")
  private val varaP = Py.compileI("""(\d+[ªº]?\s*vara.*?)""")
  private val comarcaP = Py.compileI("""comarca.*?([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*)""")
  private val adminP = Py.compileI("""administrador.*?([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*)""")
  private val oabP = Py.compileI("""oab.*?(\w+/\w+\s*\d+\.?\d*)""")
  private val passivoP = Py.compileI("""passivo.*?(\d+\.?\d*\.?\d*,\d{2})""")
  private val ativoP = Py.compileI("""ativo.*?(não\s+arrecadado|arrecadado)""")

  private def first(p: Pattern, t: String): Option[String] = {
    if (t == null) return None
    val m = p.matcher(t)
    if (m.find()) Some(m.group(1)) else None
  }

  /** Header fields; "N/A" when a pattern misses (the reference's default). */
  def processo(texto: String): Processo =
    Processo(
      first(processoP, texto).getOrElse("N/A"),
      first(varaP, texto).getOrElse("N/A"),
      first(comarcaP, texto).getOrElse("N/A"))

  def administrador(texto: String): Administrador =
    Administrador(
      first(adminP, texto).getOrElse("N/A"),
      first(oabP, texto).getOrElse("N/A"))

  def passivo(texto: String): Option[String] = first(passivoP, texto)
  def ativoStatus(texto: String): Option[String] = first(ativoP, texto)

  // xml_output_generator.py:403-418 — first matching situação pattern wins
  private val descricaoPs: Seq[Pattern] = Seq(
    """situação.*?atual[:\s]+(.*?)(?=\n\n|\n[A-Z])""",
    """empresas.*?em.*?(.*?)(?=\n\n|\n[A-Z])""",
    """estado.*?atual[:\s]+(.*?)(?=\n\n|\n[A-Z])""")
    .map(r => Pattern.compile(r, Py.IFLAGS | Pattern.DOTALL))

  def descricaoSituacao(texto: String): String =
    descricaoPs.iterator.flatMap(first(_, texto)).map(Py.strip)
      .nextOption().getOrElse("Situação não especificada")

  // xml_output_generator.py:420-439
  private val irresignacaoP = Pattern.compile(
    """irresignação.*?(\d+).*?credor.*?corrigido.*?([A-Z][^,]*?).*?valor.*?(\d+\.?\d*,\d{2}).*?classificação.*?([A-Z]+)""",
    Py.IFLAGS | Pattern.DOTALL)

  def irresignacoes(texto: String): Seq[Irresignacao] = {
    if (texto == null) return Seq.empty
    val m = irresignacaoP.matcher(texto)
    val out = ArrayBuffer.empty[Irresignacao]
    while (m.find())
      out += Irresignacao(m.group(1), Py.strip(m.group(2)), m.group(3), m.group(4))
    out.toSeq
  }
}
