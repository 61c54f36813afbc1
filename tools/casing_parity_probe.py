#!/usr/bin/env python3
"""Oracle-twin casing/whitespace parity probe (r17, committed-SQL r18).

Java/Spark String.toLowerCase applies Unicode FULL + conditional
lowercase mappings:
  - U+0130 (dotted capital I) -> U+0069 U+0307 (i + combining dot)
  - Final_Sigma: a CAPITAL sigma preceded by a cased char (skipping
    case-ignorables) and not followed by one lowers to U+03C2
and Java's regex \\s includes vertical tab U+000B while RE2's does not.
DuckDB's LOWER applies the SIMPLE mappings, so the committed oracles
emulate the full mappings in SQL (p03/p09 stopword matching, p10
fingerprint) and spell the whitespace class as [\\s\\x0b].

This probe READS THE EMULATED EXPRESSIONS FROM THE COMMITTED FILES
(r17 verdict advisory: a copy in the probe could drift from the
oracles without failing) and differential-tests them in DuckDB against
Python's str.lower()/re semantics -- CPython implements the same full
mappings and Final_Sigma context rule as Java -- on an adversarial
corpus plus a seeded fuzz. Run: python3 tools/casing_parity_probe.py
(tools/run_tests.sh runs it per round; OracleDisciplineSpec tripwires
the discipline statically from the test suite.)
"""
import duckdb
import hashlib
import random
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
P09 = (REPO / "src/main/resources/oracles/p09_lang_id.sql").read_text()
P10 = (REPO / "src/main/resources/oracles/p10_doc_fingerprint.sql").read_text()
PIPELINE = (REPO / "src/main/scala/graft/queries/Pipeline.scala").read_text()

IEMU_CANON = "LOWER(REPLACE(x, CHR(304), CHR(105) || CHR(775)))"
TR_CANON = "REPLACE(LOWER(x), CHR(775), '')"


def extract_or_die(label, text, needle, expect_at_least=1):
    n = text.count(needle)
    if n < expect_at_least:
        print(f"FAIL extract: {label}: expected >= {expect_at_least} "
              f"occurrence(s) of {needle!r}, found {n} -- the committed "
              "file drifted from the emulation this probe pins")
        sys.exit(2)
    return needle


def extract_md5_arg(sql):
    """Balanced-paren extraction of the md5(...) argument from the
    committed p10 oracle -- the exact expression the driver runs."""
    i = sql.index("md5(")
    j = i + 3  # points at the opening paren
    depth = 0
    k = j
    in_str = False
    while k < len(sql):
        c = sql[k]
        if in_str:
            if c == "'":
                if k + 1 < len(sql) and sql[k + 1] == "'":
                    k += 2
                    continue
                in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return sql[j + 1:k]
        k += 1
    print("FAIL extract: p10 md5 argument: unbalanced parens")
    sys.exit(2)


def extract_regex(label, text, call_pat):
    m = re.search(call_pat, text)
    if not m:
        print(f"FAIL extract: {label}: /{call_pat}/ not found in "
              "committed file")
        sys.exit(2)
    return m.group(1)


def main() -> int:
    # --- extract the emulated expressions from the committed files ---
    # stopword lower-emulation: every non-tr family in p09 and the p03
    # inline oracle must use the canonical pre-substituted form (10
    # families in p09; p03's single en count)
    IEMU = extract_or_die("p09 stopword lower", P09, IEMU_CANON, 10)
    extract_or_die("p03 stopword lower (Pipeline.scala)", PIPELINE,
                   IEMU_CANON, 1)
    # tr family strips the combining dot AFTER lowering instead (the
    # engine's tr-scoped strip, TextAnalysis.stopwordCountTr)
    TREMU = extract_or_die("p09 tr lower", P09, TR_CANON, 1)
    # the fingerprint expression = the exact md5 argument the driver runs
    FP = extract_md5_arg(P10).replace("text", "x")
    # tokenizer classes from the committed p02 inline oracle
    SPLIT = extract_regex("p02 split class", PIPELINE,
                          r"REGEXP_SPLIT_TO_ARRAY\(text, '(\[[^']+\]\+)'\)")
    BPEISH = extract_regex("p02 bpeish class", PIPELINE,
                           r"REGEXP_EXTRACT_ALL\(text, '([^']+)'\)")

    con = duckdb.connect()
    failures = 0

    CASES = [
        "plain english text",
        "İçin İle bu çok güzel",        # sentence-initial dotted İ (tr)
        "İl İstanbul İZMİR",            # dotted İ mid-word and all-caps
        "ΟΔΟΣ ΚΑΙ ΣΑ",                  # final + non-final capital sigma
        "ΜΕΓΑΣ Σ ΟΣΣ",                  # final sigma, lone sigma, double
        "Mixed İ and ΣΙΓΜΑΣ here",      # both classes in one string
        "The Quick BROWN fox",
        "   leading and trailing   ",
        "οδοσ οδος ς σ xσ",             # PRE-LOWERED word-final sigma: Java
                                        # leaves it alone (r18 fuzz find --
                                        # the r17 post-LOWER fix flipped it)
        "Α'Σ κάτι",                     # case-ignorable apostrophe skip
        "ΟΔΟΣ’ και",                    # ignorable AFTER the sigma
        "ΟΣ: x",                        # MidLetter colon is ignorable
        "ΟΣ. ΟΣ.Α",                     # MidNumLet period: skip then test
        "ΟΣ, ΟΣ,Α",                     # comma is NOT ignorable
        "ΑΣ̈ ΑΣ̈Α",                       # combining mark skip both ways
        "ΑΣ᾿Α ΑΣ᾿ ",                    # Sk (psili) is ignorable
        "的Σ ΟΣ的",                      # uncased letters: not cased context
        "ⅠΣ ªΣ ⓐΣ!",                    # Other_Uppercase/Lowercase ARE cased
        "a\x0bΟΣ\x0bΟΣ",                # VT as the whitespace collapse char
        # divergence class #4 (r18): DuckDB 1-arg trim strips Unicode Zs
        # separators, Spark trim strips ASCII 0x20 only — these edge
        # spaces must SURVIVE the oracle's trim(x, ' ')
        "\xa0",                         # NBSP-only doc (the r18 find)
        "\xa0ΟΣ λέξη\xa0",              # NBSP at both edges
        "\u3000全角\u3000",           # ideographic space edges
        "\u2007fig\u2007 \u1680og\u1680",  # figure + ogham space edges
    ]
    for s in CASES:
        # 1) stopword-matching emulation == python/Java full lowercase
        #    (final sigma deliberately NOT emulated there: no stopword
        #    list contains sigma, so both engines count such tokens 0)
        got = con.execute(f"SELECT {IEMU} FROM (SELECT ? AS x)",
                          [s]).fetchone()[0]
        want = s.lower()
        if got != want and got.replace("σ", "ς") != want.replace("σ", "ς"):
            print(f"FAIL stopword-lower: {s!r}: duckdb={got!r} "
                  f"python={want!r}")
            failures += 1
        # 1b) the tr form: combining-dot strip after lowering
        got_tr = con.execute(f"SELECT {TREMU} FROM (SELECT ? AS x)",
                             [s]).fetchone()[0]
        want_tr = s.lower().replace("̇", "")
        if (got_tr != want_tr
                and got_tr.replace("σ", "ς") != want_tr.replace("σ", "ς")):
            print(f"FAIL tr-lower: {s!r}: duckdb={got_tr!r} "
                  f"python={want_tr!r}")
            failures += 1
        # 2) fingerprint expression == python/Java full lowercase + md5
        got_fp = con.execute(
            f"SELECT CAST(('0x' || substr(md5({FP}), 1, 15)) AS BIGINT) "
            "FROM (SELECT ? AS x)", [s]).fetchone()[0]
        want_lower = py_fingerprint_text(s)
        want_fp = int(hashlib.md5(want_lower.encode()).hexdigest()[:15], 16)
        if got_fp != want_fp:
            got_lower = con.execute(
                f"SELECT {FP} FROM (SELECT ? AS x)", [s]).fetchone()[0]
            print(f"FAIL fingerprint: {s!r}: duckdb_lower={got_lower!r} "
                  f"python_lower={want_lower!r}")
            failures += 1
    # 2c) fingerprint fuzz: seeded strings over an alphabet rich in the
    #     divergence classes (sigma forms, ignorables, cased oddballs,
    #     dotted I, VT) -- the corpus that found the r18 lowercase-sigma
    #     overreach
    alphabet = list("ΑΒΣσςΟα 的.,:;'’·!ẍ᾿ʰ\xad\x0b\tⅠªß") + \
        ["İ", "״", "ⓐ", "̇"]
    rng = random.Random(18)
    fuzz = ["".join(rng.choice(alphabet)
                    for _ in range(rng.randint(1, 14)))
            for _ in range(500)]
    fuzz_fail = 0
    for s in fuzz:
        got_fp = con.execute(
            f"SELECT {FP} FROM (SELECT ? AS x)", [s]).fetchone()[0]
        if got_fp != py_fingerprint_text(s):
            fuzz_fail += 1
            if fuzz_fail <= 5:
                print(f"FAIL fingerprint-fuzz: {s!r}: duckdb={got_fp!r} "
                      f"python={py_fingerprint_text(s)!r}")
    failures += fuzz_fail
    # 3) whitespace-class emulation (r17 class #3): Java \s includes
    #    vertical tab U+000B, RE2's does not -- the committed tokenizer
    #    classes (extracted above) must match Java exactly
    WS_CASES = [
        "a\x0bb word",            # vertical tab: the divergent char
        "a\x0cb\tc\nd\re f",      # every Java \s member
        "a\xa0b  c",              # unicode spaces: NOT \s in either engine
        "x\x1cy",                 # file separator: not \s in either
        "tab\tand\x0b\x0bdouble",
    ]
    for s in WS_CASES:
        duck_toks = [t for t in con.execute(
            f"SELECT REGEXP_SPLIT_TO_ARRAY(?, '{SPLIT}')", [s]
        ).fetchone()[0] if t != ""]
        java_toks = [t for t in re.split("[ \t\n\x0b\f\r]+", s) if t != ""]
        if duck_toks != java_toks:
            print(f"FAIL tokens: {s!r}: duckdb={duck_toks} java={java_toks}")
            failures += 1
        duck_bp = con.execute(
            f"SELECT LEN(REGEXP_EXTRACT_ALL(?, '{BPEISH}'))", [s]
        ).fetchone()[0]
        java_bp = len(re.findall(
            "[0-9A-Za-z_]+|[^0-9A-Za-z_ \t\n\x0b\f\r]", s))
        if duck_bp != java_bp:
            print(f"FAIL bpeish: {s!r}: duckdb={duck_bp} java={java_bp}")
            failures += 1
    if failures:
        print(f"{failures} failures")
        return 1
    print(f"casing parity OK on {len(CASES)} casing + {len(fuzz)} fuzz + "
          f"{len(WS_CASES)} whitespace strings (dotted I, final sigma "
          "incl. case-ignorable skips and pre-lowered sigma, vertical "
          "tab; all expressions extracted from the committed oracles)")
    return 0


def py_fingerprint_text(s: str) -> str:
    # Java \s+ collapse (includes VT), SPARK trim (ASCII 0x20 ONLY —
    # a bare .strip() here would strip NBSP/Zs like DuckDB's 1-arg trim
    # and mask divergence class #4), Java-equivalent full lower
    return re.sub("[ \t\n\x0b\f\r]+", " ", s).strip(" ").lower()


if __name__ == "__main__":
    sys.exit(main())
