package graft.kernel

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property hardening of the pure kernel (SURVEY.md §5.3): arbitrary
  * unicode input must never throw; spans must be valid offsets into the
  * cleaned text; cleanup must be idempotent; chunkers must respect bounds.
  *
  * Uses raw ScalaCheck generators with a fixed seed (the scalatest-plus
  * bridge isn't in the offline cache) — 200 deterministic samples per
  * property.
  */
class KernelPropertySpec extends AnyFunSuite {

  // mixes plain words, OCR-confusable tokens, pattern-shaped fragments,
  // control chars, unicode, long runs
  private val fragment: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.oneOf("rn", "cl", "0", "O", "l", "1", "S", "5", "nao", "dr", "sr"),
    Gen.oneOf("123.456.789-09", "11.222.333/0001-81", "01/02/2023", "25:99",
      "x@y.zw", "R$ 1.500,00", "http://a.b", "(11) 98765-4321"),
    Gen.oneOf(" ", "", "​", " ", "ação", "ÀÉÎÕÜ", "日本語", "🙂"),
    Gen.listOfN(5, Gen.oneOf("\n", "\n\n", "\t", " ", "  ")).map(_.mkString),
    Gen.const("a" * 600))

  private val textGen: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, fragment)).map(_.mkString(" "))

  private def samples(n: Int): Seq[String] = {
    var seed = Seed(42L)
    (1 to n).map { _ =>
      val s = textGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      s
    }
  }

  private val corpus = samples(200)

  test("kernel never throws; output metrics are consistent") {
    val kernel = new TextKernel
    corpus.foreach { text =>
      val res = kernel.processSafe(text)
      res.foreach { r =>
        // kernel lengths are python len() = code points, not UTF-16 units
        assert(r.metrics.originalLength == text.codePointCount(0, text.length))
        assert(r.metrics.processedLength == r.text.codePointCount(0, r.text.length))
        assert(r.metrics.confidenceImprovement >= 0.0 &&
          r.metrics.confidenceImprovement <= 0.30 + 1e-12)
      }
    }
  }

  test("repeated cleanup matches the reference's (non-idempotent) behavior exactly") {
    // The REFERENCE pipeline is itself not idempotent: abbreviation
    // expansion + punctuation spacing regrow a trailing " ." each pass
    // (verified by executing text_processor.py on this input). We reproduce
    // that behavior bit-for-bit rather than "fixing" it (SURVEY.md §7.4).
    val kernel = new TextKernel
    val t0 = "  \n \n  \n\t   0 ação ​ 1 123.456.789-09 dr \n"
    val t1 = kernel.processSafe(t0).get.text
    assert(t1 == "o ação 1 123. 456. 789-09 dr.")
    val t2 = kernel.processSafe(t1).get.text
    assert(t2 == "o ação 1 123. 456. 789-09 dr. .")
    val t3 = kernel.processSafe(t2).get.text
    assert(t3 == "o ação 1 123. 456. 789-09 dr. . .")
  }

  test("formatText's punct no-op fast path matches the sub-only reference") {
    // the original formatText body with UNCONDITIONAL subs — the ground
    // truth the fast path must reproduce byte-for-byte (patterns verbatim)
    val pWs = Py.compile("""\s+""")
    val pSpaceBeforePunct = Py.compile("""\s+([.,;:!?])""")
    val pPunctSpace = Py.compile("""([.,;:!?])\s*""")
    val pSpaceQuote = Py.compile("""\s+\"""")
    val pQuoteSpace = Py.compile("""\"\s+""")
    val pSpaceOpenParen = Py.compile("""\s+\(""")
    val pOpenParenSpace = Py.compile("""\(\s+""")
    val pSpaceCloseParen = Py.compile("""\s+\)""")
    val pCloseParenSpace = Py.compile("""\)\s+""")
    val pTripleBreak = Py.compile("""\n\s*\n\s*\n""")
    def ref(t0: String): String = {
      var text = t0
      text = Py.sub(pSpaceBeforePunct, """\1""", text)
      text = Py.sub(pPunctSpace, Seq(Py.Grp(1), Py.Lit(" ")), text)
      text = Py.subLiteral(pSpaceQuote, " \"", text)
      text = Py.subLiteral(pQuoteSpace, "\" ", text)
      text = Py.subLiteral(pSpaceOpenParen, " (", text)
      text = Py.subLiteral(pOpenParenSpace, "(", text)
      text = Py.subLiteral(pSpaceCloseParen, ")", text)
      text = Py.subLiteral(pCloseParenSpace, ") ", text)
      text = Py.subLiteral(pWs, " ", text)
      text = Py.subLiteral(pTripleBreak, "\n\n", text)
      Py.strip(text)
    }
    val kernel = new TextKernel
    val edges = Seq(
      "", ".", ". ", "a.", "a. ", "a.b", "a. b", "a.  b", "a .b", "a . b",
      "a.\nb", "a..", "a.. b", "a,;x", "a, b. c! d? e: f; g.",
      "end with quote. \"", "(a. b)", "( a.b )", "\"a\" . b", "a...",
      "x.  ", "x. .", "tab.\tb", "nbsp. b", "a.b. c.d.", "á. ç.",
      "12:34", "12:34:56", "123.456.789-09", "a . . b", "a \t. b",
      ". . ", "a.\t\n.b", ",;:!?.", " , ; ", "R$ 1.500,00", "x:  :y")
    (edges ++ corpus).foreach { t =>
      assert(kernel.formatText(t) == ref(t),
        s"formatText fast path diverged on: ${t.take(80)}")
    }
  }

  test("confusion-probe token scanners match the verbatim reference regexes") {
    // the original probe patterns, compiled exactly as the kernel used to
    // (text_processor.py:332-365 shapes) — the ground truth the scanners
    // must reproduce: same match strings, same order, same duplicates
    import java.util.regex.Pattern
    def digitToAlpha(w: Char) =
      Py.compile("""\b\w*""" + Pattern.quote(w.toString) + """\w*\b""")
    def alphaToDigit(w: Char) =
      Py.compile("""\b\d*""" + Pattern.quote(w.toString) + """\d*\b""")
    val kernel = new TextKernel
    val adversarial = Seq(
      "", "0", "l", "5l5", "l5l", "ll", "0l0", "a0b 00 x_0 _0_",
      "5O5O", "O", "xO1", "1O", "O1", "a O b", "1 l 2", "l.l,l",
      "v0ce c0m 1nf0", "tel: 4002-8922 l1nha", "٣l٤ ٠0٠",   // Arabic-Indic digits
      "él0 combining", "a‍0 zwj a‌0 zwnj",   // marks + join controls
      "𝔞0𝔟 astral", "𝟘l astral-digit", "ǅ0 titlecase",
      "_0_ __ l_1", "über0 açã0 ação", "日本語0 漢l字",
      "0̀ grave-on-digit", "a-0-b a.0.b (0) [l5]",
      "trailing0", "0leading", "many 0s 0 0 0 dup dup0 dup0")
    (adversarial ++ corpus).foreach { t =>
      Seq('0').foreach { w =>
        assert(kernel.scanTokensContaining(t, w) == Py.findAll(digitToAlpha(w), t),
          s"digit→alpha scanner diverged for '$w' on: ${t.take(80)}")
      }
      Seq('O', 'l', 'I', 'S', 'G', 'B', 'g').foreach { w =>
        assert(kernel.scanDigitRunsWithOne(t, w) == Py.findAll(alphaToDigit(w), t),
          s"alpha→digit scanner diverged for '$w' on: ${t.take(80)}")
      }
    }
  }

  test("digit-anchored findAll matches the generic engine on the table patterns") {
    // the verbatim digit-opening patterns from the table
    // (text_processor.py:167-231) — anchored driving must yield the exact
    // same match list as the plain scan
    val table = Seq(
      ("""\b\d{3}\.?\d{3}\.?\d{3}-?\d{2}\b""", false),
      ("""\b\d{2}\.?\d{3}\.?\d{3}/?\d{4}-?\d{2}\b""", false),
      ("""\b\d{5}-?\d{3}\b""", false),
      ("""\b\(?\d{2}\)?\s?\d{4,5}-?\d{4}\b""", true),
      ("""\b\d{1,2}[\/\-\.]\d{1,2}[\/\-\.]\d{2,4}\b""", false),
      ("""\b\d{1,2}:\d{2}(:\d{2})?\b""", false),
      ("""\b\d{7}-?\d{2}\.\d{4}\.\d{1}\.\d{2}\.\d{4}\b""", true)) // paren-driving a paren-less pattern must be harmless too
      .map { case (r, paren) => (Py.compile(r), paren) }
    val kernel = new TextKernel
    def runs(t: String): (Array[Int], Int) = {
      val rs = scala.collection.mutable.ArrayBuffer.empty[Int]
      var prev = false
      var i = 0
      while (i < t.length) {
        val d = Character.isDigit(t.charAt(i))
        if (d && !prev) rs += i
        prev = d; i += 1
      }
      (rs.toArray, rs.length)
    }
    val adversarial = Seq(
      "", "123.456.789-09", "x123.456.789-09y", "123456789012345678901234",
      "(11) 98765-4321", "a(11)98765-4321", " (11 98765-4321", "((11) 91234-5678",
      "01/02/2023 25:99 12:34:56 12:34:56:78", "11.222.333/0001-81",
      "12345-678 1234567-89.0123.4.56.7890", "a1b2c3 9999",
      "٣٤٥ ١٢:٣٤ unicode digits", "1٢3 mixed-digit run",
      "00000000000", "000.000.000-00", "end digits 123", "123 start digits",
      "dots.1.2.3.4.5 colons:1:2:3", "(((((((", "()()() (1) (12)3456-7890",
      "12:34", "1:23", ":123:", "x:12:34:x")
    (adversarial ++ corpus).foreach { t =>
      val (rs, k) = runs(t)
      table.foreach { case (p, paren) =>
        assert(kernel.findAllDigitAnchored(p, t, rs, k, paren) == Py.findAll(p, t),
          s"anchored findAll diverged for ${p.pattern} on: ${t.take(80)}")
      }
    }
  }

  test("abbreviation match scanner and bounded replace match the regex engine") {
    import java.util.regex.Pattern
    val kernel = new TextKernel
    val keys = Seq("dr", "dra", "sr", "sra", "ltda", "sa", "cia", "prof",
      "profa", "av", "r", "al", "tv", "pca", "est", "rod", "km", "n", "art",
      "inc", "par", "cf", "fl", "fls", "p", "pp", "obs", "ref", "anexo",
      "apendice")
    val adversarial = Seq(
      "", "dr", "dr.", "Dr. Silva", "DR", "dR", "a_dr", "dr_a", "pedro",
      "adr dra drax", "dr dr dr", "o sr. e a sra.", "km 42 KM KKm",
      "ſr ſa", "İnc ınc inc", "n Nº nº", "ǅr",
      "r. r, r; R", "p.p pp p_p", "av av. AV Av", "ação dr ação",
      "日本語 dr 漢字", "a‍dr zwj-run", "combining dr̃ tilde",
      "𝔡r astral", "_r r_ _r_", "x.r.y", "(r) [r] {r}")
    val texts = adversarial ++ corpus
    texts.foreach { t =>
      keys.foreach { key =>
        val rx = Py.compileI("""\b""" + Pattern.quote(key) + """\b""")
        assert(kernel.scanAbbrevMatches(t, key) == Py.findAll(rx, t),
          s"abbrev scanner diverged for '$key' on: ${t.take(80)}")
      }
    }
    // bounded replace vs the verbatim case-sensitive \bm\b subLiteral
    val ms = Seq("dr", "Dr", "DR", "r", "Km", "KKm", "anexo", "Nº")
    texts.foreach { t =>
      ms.foreach { m =>
        val rx = Py.compile("""\b""" + Pattern.quote(m) + """\b""")
        assert(kernel.replaceWordBounded(t, m, "X.") == Py.subLiteral(rx, "X.", t),
          s"bounded replace diverged for '$m' on: ${t.take(80)}")
      }
    }
  }

  test("correctSpelling's no-op fast path matches the split-join reference") {
    // the original stage body (text_processor.py:367-384 semantics, the
    // correction table verbatim) — ground truth for the fast path
    val table = Seq(
      "rn" -> "m", "cl" -> "d", "li" -> "h", "nn" -> "n", "oo" -> "o",
      "ii" -> "i",
      "0" -> "o", "O" -> "0", "l" -> "1", "I" -> "1", "S" -> "5", "G" -> "6",
      "B" -> "8", "g" -> "9",
      "voce" -> "você", "nao" -> "não", "estao" -> "estão", "entao" -> "então",
      "coracao" -> "coração", "posicao" -> "posição",
      "informacao" -> "informação", "atencao" -> "atenção",
      "funcao" -> "função", "decisao" -> "decisão", "opcao" -> "opção",
      "situacao" -> "situação", "condicao" -> "condição")
    val tableMap = table.toMap
    val pNonWord = Py.compile("""[^\w]""")
    val kernel = new TextKernel
    def ref(text: String): (String, Int) = {
      var corrections = 0
      val words = Py.splitWs(text)
      var i = 0
      while (i < words.length) {
        val word = words(i)
        val cleanWord = Py.subLiteral(pNonWord, "", Py.lower(word))
        tableMap.get(cleanWord).foreach { corr =>
          val corrected = kernel.preserveWordFormat(word, corr)
          if (corrected != word) { words(i) = corrected; corrections += 1 }
        }
        i += 1
      }
      (words.mkString(" "), corrections)
    }
    val adversarial = Seq(
      "", " ", "voce", "Voce", "VOCE", "voce.", "(voce)", "v_oce", "nao nao",
      "  double  space", "tab\there", "trailing ", " leading", "não ação",
      "İ voce", "ſ nao", "voce nao", "l 0 O I S G B g", "l. (0)",
      "informacao", "informacaoo", "…voce…", "🙂voce", "a_b c-d e.f",
      "rn cl li nn oo ii", "RN Cl lI", "x\nvoce", "٣ voce", "ǅvoce",
      "K km", "0̀ combining-on-digit", "word " * 30)
    (adversarial ++ corpus).foreach { t =>
      assert(kernel.correctSpelling(t) == ref(t),
        s"correctSpelling fast path diverged on: ${t.take(80)}")
    }
  }

  test("Py.isUWordCp equals the engine's \\w over the BMP and sampled astral planes") {
    import java.util.regex.Pattern
    val w = Pattern.compile("""\w""", Pattern.UNICODE_CHARACTER_CLASS)
    def engineW(cp: Int): Boolean =
      w.matcher(new String(Character.toChars(cp))).matches()
    // full BMP sweep (surrogate code points can't be expressed as a
    // standalone string, skip them), then a sampled astral sweep covering
    // the math-alphanumeric, CJK-B, and emoji blocks
    (0 to 0xFFFF).foreach { cp =>
      if (!Character.isSurrogate(cp.toChar))
        assert(Py.isUWordCp(cp) == engineW(cp), f"isUWordCp diverged at U+$cp%04X")
    }
    (Seq(0x10000, 0x1D400, 0x1D7CE, 0x1F600, 0x20000, 0x2F800) ++
      (0x10000 to 0x2FFFF by 257)).foreach { cp =>
      assert(Py.isUWordCp(cp) == engineW(cp), f"isUWordCp diverged at U+$cp%04X")
    }
  }

  test("validateConsistency fast path matches the split-strip-filter reference") {
    val keepShort = Set(".", "!", "?", ":", ";")
    def ref(text: String): String =
      Py.splitOn(text, '\n').map(Py.strip)
        .filter(l => Py.pyLen(l) > 2 || keepShort.contains(l))
        .mkString("\n")
    val kernel = new TextKernel
    val edges = Seq(
      "", ".", "!", "?", ":", ";", ",", "ab", "abc", "ab.", "a b",
      " abc", "abc ", " . ", ".\n.", "a\nb\nc", "long line here",
      "🙂🙂", "🙂🙂🙂", "a ", " a", "x\ny lines", "tab\tend\t",
      "\n", "\n\n", "a\n", "\na")
    (edges ++ corpus).foreach { t =>
      assert(kernel.validateConsistency(t) == ref(t),
        s"validateConsistency fast path diverged on: ${t.take(80)}")
    }
    // cleanText's ASCII shortcut: C0 controls and DEL must still force the
    // rebuild path (i.e. get stripped), printable ASCII must not
    assert(kernel.cleanText("a\u0001b") == "ab")
    assert(kernel.cleanText("a\u007Fb") == "ab")
    assert(kernel.cleanText("ab cd") == "ab cd")
  }

  test("identify's literal prefilter is a sound necessary condition") {
    // the parser derives the expected literals for the inventory's shapes
    assert(SpanTemplates.requiredLiteralCI("""nota\s+fiscal""") == "fiscal")
    assert(SpanTemplates.requiredLiteralCI("""@\w+\.\w+""") == "@")
    assert(SpanTemplates.requiredLiteralCI("""\(\d{2}\)\s*\d{4,5}\-?\d{4}""") == "(")
    assert(SpanTemplates.requiredLiteralCI("""cel\.|celular""") == "cel")
    assert(SpanTemplates.requiredLiteralCI("""fone|telefone""") == "fone")
    // every built-in identification pattern must yield a non-empty literal
    // (the prefilter's whole point — a pattern edit that defeats the
    // parser silently reverts that template to unfiltered scanning)
    SpanTemplates.all.foreach { t =>
      assert(t.requiredLits.forall(_.nonEmpty),
        s"template ${t.name} has a pattern with no derivable literal: " +
          t.requiredLits.mkString("[", ", ", "]"))
    }
    // prefiltered and unfiltered matching agree on pattern-bearing text in
    // assorted cases, on the property corpus, and on the fold-guard chars
    val bearing = Seq(
      "Nota Fiscal no 123", "NOTA   FISCAL", "emitiu nfe ontem", "NFE",
      "CNPJ 11.222.333/0001-81", "valor total R$ 12,00", "VALOR\tTOTAL",
      "fatura vence", "FATURA", "mail a@b.cd ok", "tel (11) 98765-4321",
      "cel. 99999", "CELULAR novo", "fone 3222", "TELEFONE fixo",
      "cupom fiscal 77", "CUPOM FISCAL", "recibo anexo", "COMPROVANTE",
      "total pago hoje", "TOTAL PAGO", "fıscal dotless", "ſtotal long-s",
      "İstanbul nota fiscal", "")
    (bearing ++ corpus).foreach { text =>
      SpanTemplates.all.foreach { t =>
        val lowered = Py.lower(text)
        val lw =
          if (lowered.length == text.length &&
            lowered.indexOf('ı') < 0 && lowered.indexOf('ſ') < 0) lowered
          else null
        assert(t.matchesDocument(text, lw) == t.matchesDocument(text, null),
          s"prefilter changed ${t.name} on: $text")
      }
    }
  }

  test("spans are valid offsets and raw matches slice the text") {
    val kernel = new TextKernel
    corpus.foreach { text =>
      val cleaned = kernel.processSafe(text).map(_.text).getOrElse("")
      SpanTemplates.identify(cleaned).toSeq.flatMap(_.extractFields(cleaned)).foreach { f =>
        assert(f.start >= 0 && f.start <= f.end && f.end <= cleaned.length,
          s"span out of range: $f in len=${cleaned.length}")
        assert(cleaned.substring(f.start, f.end) == f.raw,
          s"raw mismatch: '${cleaned.substring(f.start, f.end)}' vs '${f.raw}'")
      }
    }
  }

  test("chunkers never exceed bounds and lose no words") {
    corpus.foreach { text =>
      val idx = Chunker.index(text, maxLength = 64)
      assert(idx.flatMap(Py.splitWs(_)).toSeq == Py.splitWs(text).toSeq)
      idx.foreach { c =>
        assert(c.length <= 64 || !c.contains(" "),
          s"multi-word chunk over bound: ${c.length}")
      }
      // semantic variant loses no NEW words either (overlap duplicates ok)
      val sem = Chunker.semantic(text, chunkSize = 64, overlapWords = 4)
      val semWords = sem.flatMap(Py.splitWs(_)).toSet
      assert(Py.splitWs(text).toSet.subsetOf(semWords) || Py.strip(text).length < 10)
    }
  }

  test("abbreviation prefilter safety: no expansion creates a later abbreviation") {
    assert(new TextKernel().abbreviationPrefilterSafe,
      "table property violated — the alternation prefilter would change semantics")
  }

  test("Py case predicates follow CPython: titlecase chars are cased but not upper") {
    // ǅ (U+01C5) is Lt: "ǅ".isupper() is False in Python, "ǅa".istitle() True
    assert(!Py.isUpperStr("ǅ"))
    assert(!Py.isUpperStr("ABǅ"))
    assert(Py.isUpperStr("AB"))
    assert(Py.isUpperStr("A1 B"))
    assert(!Py.isUpperStr("1 2"))      // no cased char
    assert(Py.isTitleStr("ǅa"))   // titlecase leads a title word
    assert(!Py.isTitleStr("aǅ"))  // upper/title after cased breaks title
  }

  test("empty input: process throws the reference's ZeroDivisionError analog; processSafe -> None") {
    val kernel = new TextKernel
    intercept[ArithmeticException](kernel.process(""))
    assert(kernel.processSafe("").isEmpty)
    assert(kernel.processSafe(null).isEmpty)
  }

  test("DocType.classify degrades null to the generic family (kernel null convention)") {
    assert(DocType.classify(null) == DocType.Generic)
    assert(DocType.classify("") == DocType.Generic)
  }

  test("sections/row-extractors never throw and produce well-formed output") {
    corpus.foreach { text =>
      Sections.split(text).foreach(s => assert(s.name.nonEmpty))
      Sections.historyEvents(text).foreach { e =>
        assert(e.data.nonEmpty && e.descricao.nonEmpty)
      }
      Sections.pedidos(text).foreach(p => assert(p.length > 10))
      Sections.creditorRows(text).foreach(r => assert(r.item.nonEmpty))
    }
  }
}
