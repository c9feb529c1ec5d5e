package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for F11/F12 — expected values produced by executing the
  * reference implementation (xml_output_generator.py:344-476) on these
  * exact inputs (see SURVEY.md §5.2 golden-pair strategy).
  */
class SectionsSpec extends AnyFunSuite {

  private val t1 =
    "Introdução preliminar ao caso.\n\nDos fatos constatados em 01/02/2023.\n\n" +
      "Segundo parágrafo dos fatos.\n\nDo direito aplicável.\n\n" +
      "Dos pedidos formulados:\n\n1. Primeiro pedido da parte autora\n" +
      "2. Segundo pedido bem detalhado\n\nConclusão final por fim."
  private val t2 =
    "Linha sem data\n01/02/2023 Despacho inicial proferido\n" +
      "Em 2023-05-10 juntada de documentos\n15-03-2024 Sentença publicada\n01/01/2020\n"
  private val t3 =
    "Quadro de credores:\n1 BANCO ALFA S.A. 1.500,00 QUIROGRAFÁRIO\n" +
      "2 FORNECEDOR BETA LTDA 23.456,78 GARANTIA REAL\n3 TRABALHADOR GAMA 987,65 TRABALHISTA\n"
  private val t4 =
    "Pedidos: \n- deferimento da justica gratuita\n- condenação ao pagamento de honorários\n" +
      "* citação da parte requerida\n9. intimação do ministério público\n\nOutra seção"

  test("section segmentation matches reference goldens (F11)") {
    val got = Sections.split(t1).map(s => s.name -> s.text).sortBy(_._1)
    val expected = Seq(
      "conclusao" -> "Conclusão final por fim.\n\n",
      "do_direito" -> "Do direito aplicável.\n\n",
      "dos_fatos" -> "Dos fatos constatados em 01/02/2023.\n\nSegundo parágrafo dos fatos.\n\n",
      "dos_pedidos" -> ("Dos pedidos formulados:\n\n1. Primeiro pedido da parte autora\n" +
        "2. Segundo pedido bem detalhado\n\n"),
      "introducao" -> "Introdução preliminar ao caso.\n\n")
    assert(got == expected)
    // single-section accumulation incl. trailing-newline shape
    assert(Sections.split(t2).map(s => s.name -> s.text) ==
      Seq("conteudo_principal" -> (t2 + "\n\n")))
  }

  test("history events match reference goldens (F12a)") {
    assert(Sections.historyEvents(t1) ==
      Seq(Sections.HistoryEvent("01/02/2023", "Dos fatos constatados em .")))
    assert(Sections.historyEvents(t2) == Seq(
      Sections.HistoryEvent("01/02/2023", "Despacho inicial proferido"),
      Sections.HistoryEvent("2023-05-10", "Em  juntada de documentos"),
      Sections.HistoryEvent("15-03-2024", "Sentença publicada")))
    assert(Sections.historyEvents(t3) == Seq.empty)
  }

  test("pedidos extraction matches reference goldens (F12b)") {
    assert(Sections.pedidos(t1) == Seq(
      "formulados:",
      "Primeiro pedido da parte autora",
      "Segundo pedido bem detalhado"))
    assert(Sections.pedidos(t4) == Seq(
      "deferimento da justica gratuita",
      "condenação ao pagamento de honorários",
      "citação da parte requerida",
      "intimação do ministério público"))
    assert(Sections.pedidos(t2) == Seq.empty)
  }

  test("creditor table rows match reference goldens (F12c)") {
    assert(Sections.creditorRows(t3) == Seq(
      Sections.CreditorRow("1", "BANCO ALFA S.A.", "1.500,00", "QUIROGRAFÁRIO"),
      Sections.CreditorRow("2", "FORNECEDOR BETA LTDA", "23.456,78", "GARANTIA REAL"),
      Sections.CreditorRow("3", "TRABALHADOR GAMA", "987,65", "TRABALHISTA")))
    assert(Sections.creditorRows(t1) == Seq.empty)
  }

  // ------- template-dispatched XML documents (S8) -------
  // Field goldens below were produced by EXECUTING the reference's
  // extractors (_detectar_tipo_documento, _extrair_*, and the template
  // header regexes from xml_output_generator.py) on these exact inputs —
  // including the reference's own non-greedy quirks (comarca "Paulo" from
  // "São Paulo", administrador "judicial na recupera", irresignação nome
  // "B" / classificação "QUIROGRAF"), which are the pinned semantics.

  private val tManif =
    "Manifestação do requerente ao Excelentíssimo juiz da 2ª vara cível.\n\n" +
      "Processo número 1234567-89.2023.8.26.0100 da comarca São Paulo.\n\n" +
      "Dos fatos ocorridos em 01/02/2023 conforme narrado.\n\n" +
      "Do direito aplicável ao caso em tela.\n\n" +
      "Pedidos: \n1. deferimento da justica gratuita\n2. condenação em honorários\n\n" +
      "Conclusão por fim requerida."
  private val tRel =
    "Relatório do administrador judicial na recuperação judicial.\n\n" +
      "Processo número 7654321-12.2024.8.26.0001 da comarca Campinas, 1ª vara.\n" +
      "Administrador Judicial Carlos Silva, OAB SP/SP 123.456.\n" +
      "Situação atual: empresas em funcionamento regular\nOutro paragrafo.\n\n" +
      "01/02/2023 Despacho inicial proferido\n15-03-2024 Sentença publicada\n\n" +
      "O passivo total é de 1.234.567,89 e o ativo não arrecadado permanece.\n" +
      "Irresignação 1 do credor corrigido BANCO ALFA, valor 1.500,00, classificação QUIROGRAFÁRIO.\n\n" +
      "Pedidos: \n- homologação do quadro\n- intimação dos credores\n\n" +
      "Quadro geral de credores anexo:\n1 BANCO ALFA S.A. 1.500,00 QUIROGRAFÁRIO\n" +
      "2 FORNECEDOR BETA LTDA 23.456,78 GARANTIA REAL\n"
  private val tQuadro =
    "Quadro geral de credores com classificação do credor por garantia real, " +
      "quirografário e trabalhista, valor do crédito listado:\n" +
      "1 BANCO ALFA S.A. 1.500,00 QUIROGRAFÁRIO\n" +
      "2 FORNECEDOR BETA LTDA 23.456,78 GARANTIA REAL\n" +
      "3 TRABALHADOR GAMA 987,65 TRABALHISTA\n"
  private val tGen =
    "Texto comum sem estrutura juridica especial.\n\nSegundo paragrafo simples."

  test("header/field extractors match reference-executed goldens") {
    assert(Sections.processo(tManif) ==
      Sections.Processo("1234567-89.2023.8.26.0100", "2ª vara", "Paulo"))
    assert(Sections.processo(tRel) ==
      Sections.Processo("7654321-12.2024.8.26.0001", "1ª vara", "Campinas"))
    assert(Sections.administrador(tRel) ==
      Sections.Administrador("judicial na recupera", "SP/SP 123.456"))
    assert(Sections.passivo(tRel).contains("1.234.567,89"))
    assert(Sections.ativoStatus(tRel).contains("não arrecadado"))
    assert(Sections.descricaoSituacao(tRel) == "empresas em funcionamento regular")
    assert(Sections.descricaoSituacao(tGen) == "Situação não especificada")
    assert(Sections.irresignacoes(tRel) ==
      Seq(Sections.Irresignacao("1", "B", "1.500,00", "QUIROGRAF")))
  }

  private def render(t: String): (String, String) =
    XmlDoc.render(t, Seq(XmlDoc.Page(1, 0.5, t)), "2024-01-15", "graft-kernel", 0.5)

  test("template dispatch picks the reference's template per document type") {
    assert(render(tManif)._1 == "manifestacao_processual")
    assert(render(tRel)._1 == "relatorio_administrador")
    assert(render(tQuadro)._1 == "quadro_credores")
    assert(render(tGen)._1 == "documento_generico")
  }

  test("whole rendered XML documents match goldens (dispatched S8)") {
    assert(render(tManif)._2 ==
      "<manifestacao><cabecalho><processo numero=\"1234567-89.2023.8.26.0100\" vara=\"2ª vara\" comarca=\"Paulo\"/><data>2024-01-15</data></cabecalho><conteudo>" +
        "<secao titulo=\"conteudo_principal\">Manifestação do requerente ao Excelentíssimo juiz da 2ª vara cível.\n\nProcesso número 1234567-89.2023.8.26.0100 da comarca São Paulo.\n\n</secao>" +
        "<secao titulo=\"dos_fatos\">Dos fatos ocorridos em 01/02/2023 conforme narrado.\n\n</secao>" +
        "<secao titulo=\"do_direito\">Do direito aplicável ao caso em tela.\n\n</secao>" +
        "<secao titulo=\"dos_pedidos\">Pedidos: \n1. deferimento da justica gratuita\n2. condenação em honorários\n\n</secao>" +
        "<secao titulo=\"conclusao\">Conclusão por fim requerida.\n\n</secao>" +
        "</conteudo><metadados versao=\"1.0\"><informacoesOCR metodo=\"graft-kernel\" confiancaMedia=\"0.5000\"/><estatisticas totalPaginas=\"1\" caracteresExtraidos=\"328\"/></metadados></manifestacao>")

    assert(render(tRel)._2 ==
      "<manifestacao><cabecalho><processo numero=\"7654321-12.2024.8.26.0001\" vara=\"1ª vara\" comarca=\"Campinas\"/>" +
        "<administrador nome=\"judicial na recupera\" oab=\"SP/SP 123.456\"/><data>2024-01-15</data></cabecalho>" +
        "<relatorio><historico><evento data=\"01/02/2023\" descricao=\"Despacho inicial proferido\"/><evento data=\"15-03-2024\" descricao=\"Sentença publicada\"/></historico>" +
        "<situacaoAtual><passivo valor=\"1.234.567,89\"/><ativo status=\"não arrecadado\"/><descricao>empresas em funcionamento regular</descricao></situacaoAtual>" +
        "<irresignacoes><irresignacao id=\"1\"><credorCorrigido nome=\"B\" valor=\"1.500,00\" classificacao=\"QUIROGRAF\"/></irresignacao></irresignacoes>" +
        "<pedidos><pedido>homologação do quadro</pedido><pedido>intimação dos credores</pedido></pedidos></relatorio>" +
        "<anexos><quadroGeralDeCredores>" +
        "<credor><item>1</item><nome>BANCO ALFA S.A.</nome><valor>1.500,00</valor><classificacao>QUIROGRAFÁRIO</classificacao></credor>" +
        "<credor><item>2</item><nome>FORNECEDOR BETA LTDA</nome><valor>23.456,78</valor><classificacao>GARANTIA REAL</classificacao></credor>" +
        "</quadroGeralDeCredores></anexos>" +
        "<metadados versao=\"1.0\"><informacoesOCR metodo=\"graft-kernel\" confiancaMedia=\"0.5000\"/><estatisticas totalPaginas=\"1\" caracteresExtraidos=\"670\"/></metadados></manifestacao>")

    assert(render(tQuadro)._2 ==
      "<quadroGeralDeCredores><informacoes dataProcessamento=\"2024-01-15\" totalPaginas=\"1\"/>" +
        "<credor><item>1</item><nome>BANCO ALFA S.A.</nome><valor>1.500,00</valor><classificacao>QUIROGRAFÁRIO</classificacao></credor>" +
        "<credor><item>2</item><nome>FORNECEDOR BETA LTDA</nome><valor>23.456,78</valor><classificacao>GARANTIA REAL</classificacao></credor>" +
        "<credor><item>3</item><nome>TRABALHADOR GAMA</nome><valor>987,65</valor><classificacao>TRABALHISTA</classificacao></credor>" +
        "<metadados versao=\"1.0\"><informacoesOCR metodo=\"graft-kernel\" confiancaMedia=\"0.5000\"/><estatisticas totalPaginas=\"1\" caracteresExtraidos=\"253\"/></metadados></quadroGeralDeCredores>")

    assert(render(tGen)._2 ==
      "<documento><informacoes dataProcessamento=\"2024-01-15\" totalPaginas=\"1\" tipoDocumento=\"generico\"/>" +
        "<conteudo>Texto comum sem estrutura juridica especial.\n\nSegundo paragrafo simples.</conteudo>" +
        "<paginas><pagina numero=\"1\" confianca=\"0.5000\">Texto comum sem estrutura juridica especial.\n\nSegundo paragrafo simples.</pagina></paginas>" +
        "<metadados versao=\"1.0\"><informacoesOCR metodo=\"graft-kernel\" confiancaMedia=\"0.5000\"/><estatisticas totalPaginas=\"1\" caracteresExtraidos=\"72\"/></metadados></documento>")
  }

  test("explicit template override skips detection; unknown types fall back to detection") {
    // generate_xml honors a caller-chosen template (xml_output_generator.py:38-40)
    val (tpl, xml) = XmlDoc.render(tGen, Seq(XmlDoc.Page(1, 0.0, tGen)),
      "2024-01-15", templateType = "quadro_credores")
    assert(tpl == "quadro_credores" && xml.startsWith("<quadroGeralDeCredores>"))
    // unknown template name -> content-scored detection (:39 fallback)
    val (tpl2, _) = XmlDoc.render(tManif, Seq(XmlDoc.Page(1, 0.0, tManif)),
      "2024-01-15", templateType = "nope")
    assert(tpl2 == "manifestacao_processual")
  }

  test("xml escaping in dispatched documents: quotes, angle brackets, ampersands") {
    val hostile = "a & b <tag> \"quoted\" text"
    val (_, xml) = XmlDoc.render(hostile, Seq(XmlDoc.Page(1, 0.0, hostile)), "2024-01-15")
    assert(xml.contains("a &amp; b &lt;tag&gt; &quot;quoted&quot; text"))
    assert(!xml.replaceAll("<[^>]*>", "").contains("<"))
  }
}
