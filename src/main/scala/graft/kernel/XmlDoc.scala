package graft.kernel

/** Template-dispatched structured-XML document render — the reference's
  * `XMLOutputGenerator.generate_xml` (xml_output_generator.py:25-52):
  * choose a template by content scoring (`DocType.classify`, :66-119),
  * then emit that template's sections/fields/tables:
  *
  *   - manifestacao_processual (:121-163): processo header + pattern-
  *     segmented sections
  *   - relatorio_administrador (:165-283): header + administrador +
  *     histórico events + situação + irresignações + pedidos + creditor
  *     annex
  *   - quadro_credores (:285-315): creditor table rows
  *   - documento_generico (:317-345): full content + per-page elements
  *
  * Differences from the reference, by design: output is compact XML (no
  * minidom prettify), and the processing date is a PARAMETER instead of
  * `datetime.now()` so renders are deterministic and reproducible — the
  * property every sink in this engine must have.
  *
  * Pure Scala (no Spark imports): used per-row inside `mapPartitions` in
  * `graft.pipeline.Render.xmlDocuments`.
  */
object XmlDoc {

  /** page-level payload (our page = a conversation turn) */
  final case class Page(numero: Int, confianca: Double, text: String)

  def esc(s: String): String =
    if (s == null) ""
    else s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")

  private def fmt(d: Double): String =
    "%.4f".formatLocal(java.util.Locale.ROOT, d)

  /** xml_output_generator.py:478-499 — OCR metadata block. */
  private def metadados(metodo: String, confMedia: Double, pages: Seq[Page]): String = {
    val chars = pages.iterator.map(p => if (p.text == null) 0 else p.text.length).sum
    s"""<metadados versao="1.0">""" +
      s"""<informacoesOCR metodo="${esc(metodo)}" confiancaMedia="${fmt(confMedia)}"/>""" +
      s"""<estatisticas totalPaginas="${pages.size}" caracteresExtraidos="$chars"/>""" +
      "</metadados>"
  }

  /** Dispatch: explicit template type, else content-scored detection
    * (generate_xml, :38-49). Returns (templateType, xml).
    */
  def render(
      texto0: String, pages: Seq[Page], processDate: String,
      metodo: String = "graft-kernel", confMedia: Double = 0.0,
      templateType: String = "auto"): (String, String) = {
    val texto = Option(texto0).getOrElse("")
    val tpl0 =
      if (templateType == "auto" || templateType == DocType.Generic ||
        !templateNames.contains(templateType))
        DocType.classify(texto)
      else templateType
    val xml = tpl0 match {
      case "manifestacao_processual" => manifestacao(texto, pages, processDate, metodo, confMedia)
      case "relatorio_administrador" => relatorio(texto, pages, processDate, metodo, confMedia)
      case "quadro_credores"         => quadro(texto, pages, processDate, metodo, confMedia)
      case _                         => generico(texto, pages, processDate, metodo, confMedia)
    }
    (tpl0, xml)
  }

  val templateNames: Set[String] = Set(
    "manifestacao_processual", "relatorio_administrador",
    "quadro_credores", DocType.Generic)

  private def cabecalhoProcesso(texto: String): String = {
    val p = Sections.processo(texto)
    s"""<processo numero="${esc(p.numero)}" vara="${esc(p.vara)}" comarca="${esc(p.comarca)}"/>"""
  }

  /** :121-163 */
  def manifestacao(
      texto: String, pages: Seq[Page], date: String,
      metodo: String, confMedia: Double): String = {
    val secoes = Sections.split(texto)
      .map(s => s"""<secao titulo="${esc(s.name)}">${esc(s.text)}</secao>""")
      .mkString
    "<manifestacao><cabecalho>" + cabecalhoProcesso(texto) +
      s"<data>${esc(date)}</data></cabecalho>" +
      s"<conteudo>$secoes</conteudo>" +
      metadados(metodo, confMedia, pages) +
      "</manifestacao>"
  }

  private def credorElems(texto: String): String =
    Sections.creditorRows(texto).map { c =>
      s"<credor><item>${esc(c.item)}</item><nome>${esc(c.nome)}</nome>" +
        s"<valor>${esc(c.valor)}</valor><classificacao>${esc(c.classificacao)}</classificacao></credor>"
    }.mkString

  /** :165-283 */
  def relatorio(
      texto: String, pages: Seq[Page], date: String,
      metodo: String, confMedia: Double): String = {
    val adm = Sections.administrador(texto)
    val eventos = Sections.historyEvents(texto)
      .map(e => s"""<evento data="${esc(e.data)}" descricao="${esc(e.descricao)}"/>""")
      .mkString
    val passivoX = Sections.passivo(texto)
      .map(v => s"""<passivo valor="${esc(v)}"/>""").getOrElse("")
    val ativoX = Sections.ativoStatus(texto)
      .map(v => s"""<ativo status="${esc(v)}"/>""").getOrElse("")
    val irr = Sections.irresignacoes(texto).map { i =>
      s"""<irresignacao id="${esc(i.id)}">""" +
        s"""<credorCorrigido nome="${esc(i.nome)}" valor="${esc(i.valor)}" classificacao="${esc(i.classificacao)}"/>""" +
        "</irresignacao>"
    }.mkString
    val pedidos = Sections.pedidos(texto)
      .map(p => s"<pedido>${esc(p)}</pedido>").mkString
    val lower = Py.lower(texto)
    val anexos = // :259-278 — annex only when a creditor table is present
      if (lower.contains("quadro") && lower.contains("credores"))
        s"<anexos><quadroGeralDeCredores>${credorElems(texto)}</quadroGeralDeCredores></anexos>"
      else ""
    "<manifestacao><cabecalho>" + cabecalhoProcesso(texto) +
      s"""<administrador nome="${esc(adm.nome)}" oab="${esc(adm.oab)}"/>""" +
      s"<data>${esc(date)}</data></cabecalho>" +
      s"<relatorio><historico>$eventos</historico>" +
      s"<situacaoAtual>$passivoX$ativoX<descricao>${esc(Sections.descricaoSituacao(texto))}</descricao></situacaoAtual>" +
      s"<irresignacoes>$irr</irresignacoes>" +
      s"<pedidos>$pedidos</pedidos></relatorio>" +
      anexos +
      metadados(metodo, confMedia, pages) +
      "</manifestacao>"
  }

  /** :285-315 */
  def quadro(
      texto: String, pages: Seq[Page], date: String,
      metodo: String, confMedia: Double): String =
    "<quadroGeralDeCredores>" +
      s"""<informacoes dataProcessamento="${esc(date)}" totalPaginas="${pages.size}"/>""" +
      credorElems(texto) +
      metadados(metodo, confMedia, pages) +
      "</quadroGeralDeCredores>"

  /** :317-345 */
  def generico(
      texto: String, pages: Seq[Page], date: String,
      metodo: String, confMedia: Double): String = {
    val paginas = pages.map { p =>
      s"""<pagina numero="${p.numero}" confianca="${fmt(p.confianca)}">${esc(p.text)}</pagina>"""
    }.mkString
    "<documento>" +
      s"""<informacoes dataProcessamento="${esc(date)}" totalPaginas="${pages.size}" tipoDocumento="generico"/>""" +
      s"<conteudo>${esc(texto)}</conteudo>" +
      s"<paginas>$paginas</paginas>" +
      metadados(metodo, confMedia, pages) +
      "</documento>"
  }
}
