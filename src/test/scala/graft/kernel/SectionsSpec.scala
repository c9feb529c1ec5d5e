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
}
