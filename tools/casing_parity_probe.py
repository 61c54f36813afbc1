#!/usr/bin/env python3
"""Oracle-twin casing parity probe (r17).

Java/Spark String.toLowerCase applies Unicode FULL lowercase mappings:
  - U+0130 (dotted capital I) -> U+0069 U+0307 (i + combining dot)
  - Final_Sigma context rule  -> word-final capital sigma becomes U+03C2
DuckDB's LOWER applies the SIMPLE mappings (U+0130 -> i, sigma always
U+03C3), so a DuckDB oracle that pairs LOWER with a Spark lower() over
free text silently diverges on I-dotted / Greek-capital-bearing rows --
invisible on the I-free shared testdata. The r17 oracles emulate the
full mappings in SQL:
  - stopword matching (p03/p09): LOWER(REPLACE(x, CHR(304), CHR(105) ||
    CHR(775)))  -- pre-substitute the dotted I's full mapping
  - fingerprint (p10): the same, plus a final-sigma post-fix
    REGEXP_REPLACE(lowered, '(\\p{L})s([^\\p{L}]|$)', '\\1c\\2', 'g')
    (direct-adjacency approximation of the case-ignorable skip rule).

This probe verifies the emulated SQL expressions against Python's
str.lower() -- which implements the same full mappings as Java -- on a
corpus of adversarial strings, including the exact md5-slice
fingerprint arithmetic. Run: python3 tools/casing_parity_probe.py
"""
import duckdb
import hashlib
import re
import sys

CASES = [
    "plain english text",
    "İçin İle bu çok güzel",            # sentence-initial dotted İ (tr)
    "İl İstanbul İZMİR",                 # dotted İ mid-word and all-caps
    "ΟΔΟΣ ΚΑΙ ΣΑ",                       # final + non-final capital sigma
    "ΜΕΓΑΣ Σ ΟΣΣ",                        # final sigma, lone sigma, double
    "Mixed İ and ΣΙΓΜΑΣ here",           # both classes in one string
    "The Quick BROWN fox",
    "   leading and trailing   ",
]

IEMU = "LOWER(REPLACE(x, CHR(304), CHR(105) || CHR(775)))"
FP = ("REGEXP_REPLACE(LOWER(REPLACE(trim(regexp_replace(x, '\\s+', ' ', 'g')), "
      "CHR(304), CHR(105) || CHR(775))), '(\\p{L})σ([^\\p{L}]|$)', '\\1ς\\2', 'g')")


def py_fingerprint_text(s: str) -> str:
    return re.sub(r"\s+", " ", s).strip().lower()


def main() -> int:
    con = duckdb.connect()
    failures = 0
    for s in CASES:
        # 1) stopword-matching emulation == python/Java full lowercase
        #    (final sigma deliberately NOT emulated there: no stopword
        #    list contains sigma, so both engines count such tokens 0)
        got = con.execute(f"SELECT {IEMU} FROM (SELECT ? AS x)", [s]).fetchone()[0]
        want = s.lower()
        # strip the final-sigma difference for the stopword comparison
        if got != want and got.replace("σ", "ς") != want.replace("σ", "ς"):
            print(f"FAIL stopword-lower: {s!r}: duckdb={got!r} python={want!r}")
            failures += 1
        # 2) fingerprint expression == python/Java full lowercase + md5 slice
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
    # 3) whitespace-class emulation (r17 class #3): Java \s includes
    #    vertical tab U+000B, RE2's does not — the oracles' tokenizer
    #    regexes use [\s\x0b]+ / [^\w\s\x0b] to match Java exactly.
    WS_CASES = [
        "a\x0bb word",            # vertical tab: the divergent char
        "a\x0cb\tc\nd\re f",      # every Java \s member
        "a\xa0b  c",         # unicode spaces: NOT \s in either engine
        "x\x1cy",                 # file separator: not \s in either
        "tab\tand\x0b\x0bdouble",
    ]
    for s in WS_CASES:
        duck_toks = [t for t in con.execute(
            r"SELECT REGEXP_SPLIT_TO_ARRAY(?, '[\s\x0b]+')", [s]
        ).fetchone()[0] if t != ""]
        java_toks = [t for t in re.split("[ \t\n\x0b\f\r]+", s) if t != ""]
        if duck_toks != java_toks:
            print(f"FAIL tokens: {s!r}: duckdb={duck_toks} java={java_toks}")
            failures += 1
        duck_bp = con.execute(
            r"SELECT LEN(REGEXP_EXTRACT_ALL(?, '\w+|[^\w\s\x0b]'))", [s]
        ).fetchone()[0]
        java_bp = len(re.findall("[0-9A-Za-z_]+|[^0-9A-Za-z_ \t\n\x0b\f\r]", s))
        if duck_bp != java_bp:
            print(f"FAIL bpeish: {s!r}: duckdb={duck_bp} java={java_bp}")
            failures += 1
    if failures:
        print(f"{failures} failures")
        return 1
    print(f"casing parity OK on {len(CASES)} casing + {len(WS_CASES)} "
          "whitespace adversarial strings (dotted I, final sigma, "
          "vertical tab; stopword, fingerprint, tokenizer expressions)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
