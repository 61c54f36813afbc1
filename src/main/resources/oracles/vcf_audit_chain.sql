WITH g AS (SELECT repeat('0', 64) AS h0),
h1 AS (
  SELECT sha256('{"event_time": "2024-01-01T00:00:00", "event_type": "load", ' ||
    '"user_name": "pipeline", "action": "load_vcf", "success": true, ' ||
    '"details": {}, "previous_hash": "' || h0 || '"}') AS h, h0 FROM g
),
h2 AS (
  SELECT sha256('{"event_time": "2024-01-01T01:00:00", "event_type": "qc", ' ||
    '"user_name": "pipeline", "action": "sample_qc", "success": true, ' ||
    '"details": {}, "previous_hash": "' || h1.h || '"}') AS h, h1.h AS hp FROM h1
),
h3 AS (
  SELECT sha256('{"event_time": "2024-01-01T02:00:00", "event_type": "export", ' ||
    '"user_name": "pipeline", "action": "export_plink", "success": true, ' ||
    '"details": {}, "previous_hash": "' || h2.h || '"}') AS h, h2.h AS hp FROM h2
)
SELECT CAST(1 AS BIGINT) AS audit_id, h1.h AS entry_hash, h1.h0 AS previous_hash,
  TRUE AS chain_valid FROM h1
UNION ALL
SELECT 2, h2.h, h2.hp, TRUE FROM h2
UNION ALL
SELECT 3, h3.h, h3.hp, TRUE FROM h3
