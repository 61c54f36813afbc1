-- Fingerprint oracle: md5 slice of the whitespace-collapsed, trimmed,
-- lowercased text. "Lowercased" on the engine side is Java
-- String.toLowerCase (Locale.ROOT) = Unicode FULL mappings; DuckDB's
-- LOWER applies the SIMPLE mappings, so the two divergent mappings are
-- emulated in SQL (r17, tightened r18):
--   * U+0130 dotted capital I -> i + combining U+0307 (full mapping):
--     pre-substituted before LOWER.
--   * Final_Sigma: a CAPITAL SIGMA preceded by a cased char (skipping
--     case-ignorables) and NOT followed by one (after the same skip)
--     lowers to final sigma. Applied to the ORIGINAL text, capital
--     SIGMA only -- Java leaves a pre-existing lowercase word-final
--     sigma alone, so the r17 post-LOWER fix overreached on such input
--     (found by the r18 fuzz; no shared-corpus key ever saw it).
--     The regex classes are EXACT per the Unicode definitions:
--       cased          = Lu|Ll|Lt + Other_Uppercase/Other_Lowercase
--                        (U+00AA U+00BA, Roman numerals U+2160-217F,
--                        circled U+24B6-24E9, squared/negative-circled
--                        U+1F130-1F189)
--       case-ignorable = Mn|Me|Cf|Lm|Sk + Word_Break MidLetter/
--                        MidNumLet/Single_Quote (' ’ . : U+00B7 U+0387
--                        U+055F U+05F4 U+2018 U+2024 U+2027 U+FE13
--                        U+FE52 U+FE55 U+FF07 U+FF0E U+FF1A)
--     derived empirically against CPython's Final_Sigma implementation
--     over every codepoint (Java implements the same spec rule).
--   * trim is spelled with the EXPLICIT ' ' charset (r18): DuckDB's
--     one-argument trim strips every Unicode Zs space separator (NBSP,
--     figure/ideographic/ogham spaces...) while Spark's trim strips
--     only ASCII 0x20 — divergence class #4, found by the adversarial
--     corpus gate on an NBSP-only document (tools/adversarial_corpus.py).
-- tools/casing_parity_probe.py reads the md5 argument FROM THIS FILE
-- and differential-tests it against Python's full-casing semantics on
-- an adversarial corpus; OracleDisciplineSpec tripwires the whitespace,
-- casing and trim discipline across every committed oracle.
SELECT doc_id,
  CAST(('0x' || substr(md5(
    LOWER(REPLACE(
      REGEXP_REPLACE(
        trim(regexp_replace(text, '[\s\x0b]+', ' ', 'g'), ' '),
        '([\p{Lu}\p{Ll}\p{Lt}\x{aa}\x{ba}\x{2160}-\x{217f}\x{24b6}-\x{24e9}\x{1f130}-\x{1f149}\x{1f150}-\x{1f169}\x{1f170}-\x{1f189}][\p{Mn}\p{Me}\p{Cf}\p{Lm}\p{Sk}''’.:·\x{387}\x{55f}\x{5f4}\x{2018}\x{2024}\x{2027}\x{fe13}\x{fe52}\x{fe55}\x{ff07}\x{ff0e}\x{ff1a}]*)Σ([\p{Mn}\p{Me}\p{Cf}\p{Lm}\p{Sk}''’.:·\x{387}\x{55f}\x{5f4}\x{2018}\x{2024}\x{2027}\x{fe13}\x{fe52}\x{fe55}\x{ff07}\x{ff0e}\x{ff1a}]*([^\p{Lu}\p{Ll}\p{Lt}\x{aa}\x{ba}\x{2160}-\x{217f}\x{24b6}-\x{24e9}\x{1f130}-\x{1f149}\x{1f150}-\x{1f169}\x{1f170}-\x{1f189}\p{Mn}\p{Me}\p{Cf}\p{Lm}\p{Sk}''’.:·\x{387}\x{55f}\x{5f4}\x{2018}\x{2024}\x{2027}\x{fe13}\x{fe52}\x{fe55}\x{ff07}\x{ff0e}\x{ff1a}]|$))',
        '\1ς\2', 'g'),
      CHR(304), CHR(105) || CHR(775)))), 1, 15)) AS BIGINT) AS fingerprint
FROM documents ORDER BY doc_id
