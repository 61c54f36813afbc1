WITH t AS (
  SELECT doc_id, lang AS lang_label, text,
    GREATEST(LENGTH(text), 1) AS n,
    LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '[\s\x0b]+'), x -> x != '') AS toks
  FROM documents
),
r AS (
  SELECT doc_id, lang_label, text,
    1.0 - CAST(LENGTH(REGEXP_REPLACE(text, '[\x{3040}-\x{30ff}]', '', 'g')) AS DOUBLE) / n AS kana,
    1.0 - CAST(LENGTH(REGEXP_REPLACE(text, '[\x{4e00}-\x{9fff}]', '', 'g')) AS DOUBLE) / n AS han,
    1.0 - CAST(LENGTH(REGEXP_REPLACE(text, '[\x{ac00}-\x{d7af}]', '', 'g')) AS DOUBLE) / n AS hangul,
    1.0 - CAST(LENGTH(REGEXP_REPLACE(text, '[\x{0400}-\x{04ff}]', '', 'g')) AS DOUBLE) / n AS cyr,
    1.0 - CAST(LENGTH(REGEXP_REPLACE(text, '[\x{0600}-\x{06ff}]', '', 'g')) AS DOUBLE) / n AS arab,
    CAST(LEN(LIST_FILTER(toks, x -> LIST_CONTAINS(['the','a','an','and','or','of','to','in','is','are','was','it','that','this','for','on','with','as'], LOWER(REPLACE(x, CHR(304), CHR(105) || CHR(775)))))) AS DOUBLE) / GREATEST(LEN(toks), 1) AS en,
    CAST(LEN(LIST_FILTER(toks, x -> LIST_CONTAINS(['der','die','das','und','oder','von','zu','in','ist','sind','war','es','dass','für','auf','mit','als','ein','eine'], LOWER(REPLACE(x, CHR(304), CHR(105) || CHR(775)))))) AS DOUBLE) / GREATEST(LEN(toks), 1) AS de,
    CAST(LEN(LIST_FILTER(toks, x -> LIST_CONTAINS(['le','la','les','et','ou','de','du','à','en','est','sont','était','il','que','ce','pour','sur','avec','un','une'], LOWER(REPLACE(x, CHR(304), CHR(105) || CHR(775)))))) AS DOUBLE) / GREATEST(LEN(toks), 1) AS fr,
    CAST(LEN(LIST_FILTER(toks, x -> LIST_CONTAINS(['el','la','los','las','y','o','de','del','a','en','es','son','era','que','este','para','sobre','con','un','una'], LOWER(REPLACE(x, CHR(304), CHR(105) || CHR(775)))))) AS DOUBLE) / GREATEST(LEN(toks), 1) AS es,
    CAST(LEN(LIST_FILTER(toks, x -> LIST_CONTAINS(['o','a','os','as','e','ou','de','do','da','em','é','são','era','que','este','para','sobre','com','um','uma'], LOWER(REPLACE(x, CHR(304), CHR(105) || CHR(775)))))) AS DOUBLE) / GREATEST(LEN(toks), 1) AS pt,
    CAST(LEN(LIST_FILTER(toks, x -> LIST_CONTAINS(['il','lo','la','i','gli','le','e','o','di','del','della','in','è','sono','era','che','questo','per','su','con','un','una'], LOWER(REPLACE(x, CHR(304), CHR(105) || CHR(775)))))) AS DOUBLE) / GREATEST(LEN(toks), 1) AS it,
    CAST(LEN(LIST_FILTER(toks, x -> LIST_CONTAINS(['de','het','een','en','of','van','te','in','is','zijn','was','dat','dit','voor','op','met','als'], LOWER(REPLACE(x, CHR(304), CHR(105) || CHR(775)))))) AS DOUBLE) / GREATEST(LEN(toks), 1) AS nl,
    CAST(LEN(LIST_FILTER(toks, x -> LIST_CONTAINS(['och','att','det','som','en','är','av','för','på','med','ett','var','han','hon','inte','jag','vi','om'], LOWER(REPLACE(x, CHR(304), CHR(105) || CHR(775)))))) AS DOUBLE) / GREATEST(LEN(toks), 1) AS sv,
    CAST(LEN(LIST_FILTER(toks, x -> LIST_CONTAINS(['w','z','na','się','jest','nie','że','od','po','za','był','było','byli','jak','co'], LOWER(REPLACE(x, CHR(304), CHR(105) || CHR(775)))))) AS DOUBLE) / GREATEST(LEN(toks), 1) AS pl,
    CAST(LEN(LIST_FILTER(toks, x -> LIST_CONTAINS(['ve','bir','bu','çok','için','ile','ama','onu','bence','daha','gibi','sonra','kadar','biz','ne','değil'], REPLACE(LOWER(x), CHR(775), '')))) AS DOUBLE) / GREATEST(LEN(toks), 1) AS tr,
    CAST(LEN(LIST_FILTER(toks, x -> LIST_CONTAINS(['și','în','de','la','cu','pe','este','sunt','un','o','nu','mai','pentru','din','ce','dar','că','după','ar','fost','să'], LOWER(REPLACE(x, CHR(304), CHR(105) || CHR(775)))))) AS DOUBLE) / GREATEST(LEN(toks), 1) AS ro
  FROM t
),
s AS (
  SELECT doc_id, lang_label, text, kana, han, hangul, cyr, arab,
    en, de, fr, es, pt, it, nl, sv, pl, tr, ro,
    LIST_SORT([en, de, fr, es, pt, it, nl, sv, pl, tr, ro]) AS srt
  FROM r
),
p AS (
  SELECT doc_id, lang_label,
    CASE WHEN text IS NULL OR LENGTH(text) = 0 THEN 'unknown'
         WHEN kana > 0.05 THEN 'ja'
         WHEN han > 0.3 THEN 'zh'
         WHEN hangul > 0.3 THEN 'ko'
         WHEN cyr > 0.3 THEN 'ru'
         WHEN arab > 0.3 THEN 'ar'
         WHEN srt[11] = 0.0 THEN 'unknown'
         WHEN srt[11] = en THEN 'en'
         WHEN srt[11] = de THEN 'de'
         WHEN srt[11] = fr THEN 'fr'
         WHEN srt[11] = es THEN 'es'
         WHEN srt[11] = pt THEN 'pt'
         WHEN srt[11] = it THEN 'it'
         WHEN srt[11] = nl THEN 'nl'
         WHEN srt[11] = sv THEN 'sv'
         WHEN srt[11] = pl THEN 'pl'
         WHEN srt[11] = tr THEN 'tr'
         ELSE 'ro' END AS lang_pred,
    CASE WHEN text IS NULL OR LENGTH(text) = 0 THEN 0.0
         WHEN kana > 0.05 THEN kana
         WHEN han > 0.3 THEN han
         WHEN hangul > 0.3 THEN hangul
         WHEN cyr > 0.3 THEN cyr
         WHEN arab > 0.3 THEN arab
         WHEN srt[11] = 0.0 THEN 0.0
         ELSE srt[11] - srt[10] END AS lang_margin
  FROM s
)
SELECT doc_id, lang_label, lang_pred, lang_margin,
  lang_label = lang_pred AS correct
FROM p ORDER BY doc_id
