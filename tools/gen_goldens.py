#!/usr/bin/env python3
"""Golden-fixture generator.

Executes the REFERENCE implementation (read-only, /root/reference) as an
oracle over a deterministic corpus, dumping exact input->output pairs to
src/test/resources/graft/golden_kernel.json. The Scala kernel test suite
asserts byte-for-byte equality against these goldens (per-turn text
equality per the north rule). No reference code is copied into the Scala
tree; this script only *runs* it to capture expected outputs.

Corpus = handcrafted cases (FIXTURES.md section 3) + texts produced by the
same splitmix64 fragment-combination generator used by graft.pipeline
.TranscriptGen (bit-identical in Scala and Python).
"""
import json, re, sys, types, pathlib

REF = pathlib.Path("/root/reference/src")
REPO = pathlib.Path("/root/repo")

# ---- load reference modules with the package-relative logger stubbed ----
def load_module(path, name, extra_src_subs=()):
    src = path.read_text()
    src = re.sub(r"^from \.+utils\.logger import get_logger$", "", src, flags=re.M)
    src = re.sub(r"^from \.logger import get_logger$", "", src, flags=re.M)
    for a, b in extra_src_subs:
        src = src.replace(a, b)
    mod = types.ModuleType(name)
    class _L:
        def info(self, *a, **k): pass
        def warning(self, *a, **k): pass
        def error(self, *a, **k): pass
        def debug(self, *a, **k): pass
    mod.get_logger = lambda *a, **k: _L()
    exec(compile(src, str(path), "exec"), mod.__dict__)
    return mod

tp_mod = load_module(REF / "utils/text_processor.py", "ref_text_processor")
tmpl_mod = load_module(REF / "automation/templates.py", "ref_templates")
xml_mod = load_module(REF / "utils/xml_output_generator.py", "ref_xml")

processor_factory = lambda: tp_mod.TextProcessor("pt-BR")
xmlgen = xml_mod.XMLOutputGenerator()

# Built-in templates without touching $HOME: call the loader on a bare object.
class _TM:  # minimal shim exposing .templates for _load_builtin_templates
    def __init__(self):
        self.templates = {}
        class _L:
            def info(self, *a, **k): pass
        self.logger = _L()
tm = _TM()
tmpl_mod.TemplateManager._load_builtin_templates(tm)
TEMPLATES = list(tm.templates.values())  # insertion order: invoice, business_card, receipt

def identify(text):
    best, best_conf = None, 0.0
    for t in TEMPLATES:
        c = t.matches_document(text)
        if c > best_conf and c >= t.confidence_threshold:
            best_conf, best = c, t
    return best

# ---- splitmix64 generator (must match graft.pipeline.TranscriptGen) ----
M = (1 << 64) - 1
def sm64(x):
    x = (x + 0x9E3779B97F4A7C15) & M
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
    return (z ^ (z >> 31)) & M

FRAGMENTS = json.load(open(REPO / "src/main/resources/graft/fragments.json"))
NF = len(FRAGMENTS)

def turn_text(conv, turn):
    s = sm64((conv * 0x9E3779B97F4A7C15 + turn) & M)
    k = 1 + ((s >> 33) % 4)
    parts = []
    for _ in range(k):
        s = sm64(s)
        parts.append(FRAGMENTS[(s >> 33) % NF])
    return " ".join(parts)

def conv_turns(conv):
    base = 4 + ((sm64((conv * 31 + 7) & M) >> 33) % 28)
    return base * 50 if conv % 97 == 0 else base

# ---- corpus ----
handcrafted = [
    # canonical dirty doc (text_processor.py:727-739)
    """
    DOCIJMENTO DE TESTE

    Este é um texto com erros tipicos de OCR.
    O nome do cliente é João da Silva, CPF: 123.456.789-01
    Telefone: (11) 99999-9999
    Email: joao@exemplo.com

    Data: 09/07/2025
    Valor: R$ 1.500,00

    Observacoes: nao houve problemas durante o processamento.
    """,
    # pattern truth table (test_text_processing.py:84-93)
    "123.456.789-09", "123.456.789-00", "11.222.333/0001-81",
    "(11) 99999-9999", "usuario@exemplo.com.br", "09/07/2025",
    "14:30:00", "R$ 1.500,00", "01234-567",
    "João Silva, CPF: 123.456.789-09, tel: (11) 99999-9999",
    # correction cases (test_text_processing.py:144-151)
    "nao sei se voce pode", "rn lugar de m", "dr silva",
    "palavra1  palavra2", "Olá , como vai ?", "  texto  com  espaços  ",
    # legal-doc classification (test_text_processing.py:376-398 analog)
    ("CONTRATO DE PRESTAÇÃO DE SERVIÇOS. Empresa ABC Ltda, CNPJ 11.222.333/0001-81, "
     "contrata João da Silva, CPF 123.456.789-09, pelo valor de R$ 5.000,00 "
     "com vencimento em 31/12/2025."),
    # edge cases
    "", " ", "\n\n\n", "a", "..", "...",
    "hello world plain english text",
    "email invalido user@ e valido user@domain.com juntos",
]

corpus = list(handcrafted)
seen = set(corpus)
N_CONVS = 40
for conv in range(N_CONVS):
    for turn in range(min(conv_turns(conv), 30)):
        t = turn_text(conv, turn)
        if t not in seen:
            seen.add(t)
            corpus.append(t)

# ---- adversarial corpus: control chars, unicode (incl. astral), pattern-
# shaped fragments, OCR-confusables, long runs, pathological whitespace —
# deterministic via sm64, mirroring the shapes KernelPropertySpec fuzzes,
# but here with the REFERENCE as the oracle (byte-for-byte equality). ----
ADV_FRAGMENTS = [
    "rn", "cl", "0", "O", "l", "1", "S", "5", "nao", "dr", "sr", "profa",
    "123.456.789-09", "123.456.789-00", "11.222.333/0001-81", "01/02/2023",
    "29/02/2024", "25:99", "14:3", "x@y.zw", "R$ 1.500,00", "R$",
    "http://a.b/c?d=1", "https://", "(11) 98765-4321", "01234-567",
    "0000000-00.0000.0.00.0000",
    "ação", "ÀÉÎÕÜ", "coraçao", "informacao", "日本語", "🙂", "a\x00b",
    "x\x07y", "​", " ", "tab\there", "nl\nnl", "dbl\n\nnl",
    "  ", "...", "!?;:", "(paren", "paren)", '"quoted"', "um,dois;tres",
    "a" * 50, "MiXeD CaSe WoRdS", "UPPER CASE", "Title Case",
    "\U0001d400l", "\U0001d49cction", "x\U0001d400l5y",  # astral letters (surrogate-pair Lu/Lu)

]

def adv_text(i):
    s = sm64(0xADF00 + i)
    k = 1 + ((s >> 33) % 8)
    parts = []
    for _ in range(k):
        s = sm64(s)
        parts.append(ADV_FRAGMENTS[(s >> 33) % len(ADV_FRAGMENTS)])
    seps = [" ", " ", " ", "\n", "\n\n", "", "\t"]
    s = sm64(s)
    sep = seps[(s >> 33) % len(seps)]
    return sep.join(parts)

for i in range(300):
    t = adv_text(i)
    if t not in seen:
        seen.add(t)
        corpus.append(t)

# ---- run oracle ----
rows = []
for text in corpus:
    proc = processor_factory()  # fresh instance: no cross-text stats effects
    try:
        cleaned, metrics = proc.process_text(text)
    except ZeroDivisionError:
        # reference crashes on len(original)==0 — our engine maps this to an
        # error row (success=false), recorded here as {"error": true}
        rows.append({"text": text, "error": True})
        continue
    doc_type = xmlgen._detectar_tipo_documento(cleaned)
    tpl = identify(cleaned)
    spans = []
    if tpl is not None:
        for fe in tpl.fields:
            r = fe.extract(cleaned)
            if r and r.get("position") is not None:
                spans.append({
                    "name": fe.name, "value": r["value"],
                    "confidence": r["confidence"],
                    "start": r["position"][0], "end": r["position"][1],
                    "raw": r["raw_match"],
                })
    rows.append({
        "text": text,
        "clean": cleaned,
        "original_length": metrics.original_length,
        "processed_length": metrics.processed_length,
        "words_corrected": metrics.words_corrected,
        "patterns_detected": metrics.patterns_detected,
        "conf_delta": metrics.confidence_improvement,
        "corrections_applied": metrics.corrections_applied,
        "patterns": metrics.patterns_found,
        "doc_type": doc_type,
        "template": tpl.name if tpl else None,
        "spans": spans,
    })

# validator truth tables (FIXTURES.md 3.3)
proc = processor_factory()
validators = {
    "cpf": {s: proc._validate_cpf(s) for s in
            ["123.456.789-09", "111.444.777-35", "123.456.789-00",
             "111.111.111-11", "123.456.789-10", "12345678909", "123"]},
    "cnpj": {s: proc._validate_cnpj(s) for s in
             ["11.222.333/0001-81", "11.222.333/0001-80", "11222333000181",
              "11.111.111/1111-11", "123"]},
    "date": {s: proc._validate_date(s) for s in
             ["09/07/2025", "31/12/2024", "29/02/2024", "29/02/2023",
              "32/01/2025", "30/02/2025", "09/13/2025", "01/01/49",
              "01/01/50", "1/1/1899", "5-6-2020", "5.6.2020"]},
    "time": {s: proc._validate_time(s) for s in
             ["14:30:00", "14:30", "00:00", "23:59:59", "24:00",
              "12:60", "12:30:60", ":00"]},
    "email": {s: proc._validate_email(s) for s in
              ["user@domain.com", "test.email@example.com.br",
               "invalid-email", "user@", "@domain.com", "a@b", "a@b_c.com"]},
}

out = {
    "generator": {"n_convs": N_CONVS, "fragments": FRAGMENTS},
    "rows": rows,
    "validators": validators,
}
dest = REPO / "src/test/resources/graft/golden_kernel.json"
dest.parent.mkdir(parents=True, exist_ok=True)
dest.write_text(json.dumps(out, ensure_ascii=False, indent=1))
print(f"wrote {dest}: {len(rows)} rows")
# quick sanity peek
for r in rows[:2]:
    print(json.dumps({k: r[k] for k in ('clean','patterns','doc_type','conf_delta')},
                     ensure_ascii=False)[:400])
