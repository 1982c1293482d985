"""Generated DuckDB oracle SQL for bit-math operators.

The driver executes each oracle as ONE SQL statement (no session macros),
so the 64-bit wraparound arithmetic the simhash kernel uses is inlined
here as a chain of CTE steps. Parity facts the builders rely on
(validated in tests/test_sql_parity.py):

- FNV-1a over unicode codepoints: the fold constant 0x100000001B3 < 2^41,
  so HUGEINT (int128) holds acc * prime directly.
- splitmix64's mix constants are ~2^63, so acc * M would overflow int128;
  the builders emit a 32-bit split multiply
  (lo(a) * M + (hi(a) * M mod 2^32) * 2^32) mod 2^64.
- DuckDB ``range(64)`` + bit shifts on UBIGINT give the per-bit majority
  vote; ``sum`` of the reassembled bit values is HUGEINT, cast back.
"""

from __future__ import annotations

M64 = 1 << 64
GAMMA = 0x9E3779B97F4A7C15
MIX1 = 0xBF58476D1CE4E5B9
MIX2 = 0x94D049BB133111EB
FNV_OFF = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3


def _u64mul(expr: str, const: int) -> str:
    """(expr * const) mod 2^64 without int128 overflow (32-bit split)."""
    return (
        f"CAST((((CAST({expr} AS HUGEINT) % 4294967296) * {const}) + "
        f"(((CAST({expr} AS HUGEINT) // 4294967296) * {const}) % 4294967296)"
        f" * 4294967296) % {M64} AS UBIGINT)"
    )


def simhash_ctes(docs_cte: str, seed: int = 11) -> str:
    """CTE chain computing ``fp(doc_id, sh_u UBIGINT, sh BIGINT)`` — the
    64-bit SimHash of ``docs_cte(doc_id, text)`` — matching
    stages/dedup.py simhash64/_token_hashes bit-exactly."""
    seed_gamma = (seed * GAMMA) % M64
    fold = (
        "list_reduce(list_prepend("
        f"CAST({FNV_OFF} AS UBIGINT), "
        "list_transform(range(1, length(tok) + 1), "
        "i -> CAST(unicode(substr(tok, i, 1)) AS UBIGINT))), "
        "(acc, cp) -> CAST((CAST(xor(acc, cp) AS HUGEINT) * "
        f"{FNV_PRIME}) % {M64} AS UBIGINT))"
    )
    return f"""
toks AS (
  SELECT doc_id, tok
  FROM {docs_cte}, unnest(regexp_split_to_array(text, '\\s+')) AS u(tok)
  WHERE tok != ''
),
h0 AS (SELECT doc_id, {fold} AS v FROM toks),
h1 AS (SELECT doc_id,
              CAST((CAST(v AS HUGEINT) + {seed_gamma}) % {M64} AS UBIGINT) AS v
       FROM h0),
h2 AS (SELECT doc_id, xor(v, v >> 30) AS v FROM h1),
h3 AS (SELECT doc_id, {_u64mul('v', MIX1)} AS v FROM h2),
h4 AS (SELECT doc_id, xor(v, v >> 27) AS v FROM h3),
h5 AS (SELECT doc_id, {_u64mul('v', MIX2)} AS v FROM h4),
th AS (SELECT doc_id, xor(v, v >> 31) AS h FROM h5),
bits AS (
  SELECT doc_id, b,
         CASE WHEN sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) > 0
              THEN CAST(1 AS UBIGINT) << b ELSE CAST(0 AS UBIGINT) END AS bv
  FROM th, unnest(range(64)) AS r(b)
  GROUP BY doc_id, b
),
fp AS (
  SELECT d.doc_id,
         COALESCE(CAST(sum(bv) AS UBIGINT), CAST(0 AS UBIGINT)) AS sh_u,
         CAST(COALESCE(CAST(sum(bv) AS HUGEINT), 0)
              - CASE WHEN COALESCE(CAST(sum(bv) AS HUGEINT), 0)
                          >= 9223372036854775808
                     THEN CAST({M64} AS HUGEINT) ELSE 0 END AS BIGINT) AS sh
  FROM {docs_cte} d LEFT JOIN bits USING (doc_id)
  GROUP BY d.doc_id
)"""


def simhash_fingerprints_sql() -> str:
    return f"""
WITH d0 AS (SELECT doc_id, text FROM documents),
{simhash_ctes('d0')}
SELECT doc_id, sh AS simhash FROM fp
"""


def simhash_dup_pairs_sql(max_hamming: int = 3) -> str:
    """Exact Hamming <= k pairs over the planted-twin corpus (the Ray
    query's pigeonhole bucketing is lossless for k < n_chunks, so the
    output equals the all-pairs filter)."""
    return f"""
WITH d0 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text ELSE text || ' appendix' END AS text
  FROM documents WHERE doc_id < 24
),
{simhash_ctes('d0')}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= {max_hamming}
ORDER BY id_a, id_b
"""
