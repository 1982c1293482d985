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


def rnd(expr: str, n: int) -> str:
    """Correctly-rounded half-to-even decimal rounding in SQL. DuckDB's
    round_even misrounds near-tie doubles (its own scaled-double artifact
    — observed at n=6 on sf0.1, profile_lai max_lai), while printf goes
    through fmt's correctly-rounded formatter. Pairs bit-exactly with
    stages/rounding.round_decimal and CPython round() — see
    stages/rounding.py for the verification protocol. Use this (not
    round_even) for any oracle column whose Ray side rounds with
    round_decimal or builtin round."""
    return f"CAST(printf('%.{n}f', {expr}) AS DOUBLE)"


def _u64mul(expr: str, const: int) -> str:
    """(expr * const) mod 2^64 without int128 overflow (32-bit split)."""
    return (
        f"CAST((((CAST({expr} AS HUGEINT) % 4294967296) * {const}) + "
        f"(((CAST({expr} AS HUGEINT) // 4294967296) * {const}) % 4294967296)"
        f" * 4294967296) % {M64} AS UBIGINT)"
    )


IDX_MUL = 0xD6E8FEB86659FD93
SEED_MUL = 0x2545F4914F6CDD1D


def hash_u64_cols(idx_expr: str, seed: int, stream: int, prefix: str) -> tuple[str, str]:
    """SELECT-list fragment computing ``fixtures.rng.hash_u64(idx, seed,
    stream)`` bit-exactly via DuckDB lateral column aliases (each mix step
    is one alias referencing the previous — no exponential expression
    blowup). Returns ``(fragment, hash_column_name)``; parity validated in
    tests/test_sql_parity.py."""
    c0 = (seed * SEED_MUL + stream * GAMMA + GAMMA) % M64
    p = prefix
    frag = (
        f"CAST((CAST({_u64mul(idx_expr, IDX_MUL)} AS HUGEINT) + {c0})"
        f" % {M64} AS UBIGINT) AS {p}_z0, "
        f"xor({p}_z0, {p}_z0 >> 30) AS {p}_z1, "
        f"{_u64mul(f'{p}_z1', MIX1)} AS {p}_z2, "
        f"xor({p}_z2, {p}_z2 >> 27) AS {p}_z3, "
        f"{_u64mul(f'{p}_z3', MIX2)} AS {p}_z4, "
        f"xor({p}_z4, {p}_z4 >> 31) AS {p}_h"
    )
    return frag, f"{p}_h"


def splitmix64_cols(x_expr: str, prefix: str) -> tuple[str, str]:
    """SELECT-list fragment computing ``fixtures.rng.splitmix64(x)``
    bit-exactly (the plain mix, no index/seed premultiply — this is what
    ``stages/sketches._hash64`` applies to integer keys). Returns
    ``(fragment, hash_column_name)``."""
    p = prefix
    frag = (
        f"CAST((CAST({x_expr} AS HUGEINT) + {GAMMA}) % {M64} AS UBIGINT)"
        f" AS {p}_z0, "
        f"xor({p}_z0, {p}_z0 >> 30) AS {p}_z1, "
        f"{_u64mul(f'{p}_z1', MIX1)} AS {p}_z2, "
        f"xor({p}_z2, {p}_z2 >> 27) AS {p}_z3, "
        f"{_u64mul(f'{p}_z3', MIX2)} AS {p}_z4, "
        f"xor({p}_z4, {p}_z4 >> 31) AS {p}_h"
    )
    return frag, f"{p}_h"


def hll_register_ctes(src_cte: str, key_expr: str, grp_cols: str = "") -> str:
    """CTE chain replaying ``stages/sketches.HLL`` (p=12) over integer keys
    from ``src_cte``: splitmix64 hash, top-12-bit register index, rank =
    leading zeros of the guarded remainder + 1. The rank replicates the
    kernel's float64-exponent extraction exactly: the remainder is cast to
    DOUBLE first (so a value that ROUNDS UP to the next power of two gets
    the incremented exponent, as numpy's uint64->float64 cast does), and
    the exponent is recovered from log2 with a +-1 integer correction
    against exact powers of two. Produces ``reg(<grp,> idx, m)`` and
    ``hest(<grp,> z, raw_e)``; the caller applies the linear-counting
    branch. Empty-input note: ``hest`` has no row for a group with no keys
    — callers join against the group list when that matters."""
    g = f"{grp_cols}, " if grp_cols else ""
    frag, h = splitmix64_cols("k", "hl")
    m = 1 << 12
    alpha = f"(0.7213 / (1 + 1.079 / {m}))"
    return f"""
hky AS (SELECT {g}{key_expr} AS k FROM {src_cte}),
hhs AS (SELECT {g}{frag} FROM hky),
hrk AS (
  SELECT {g}CAST({h} >> 52 AS BIGINT) AS idx,
         CAST((CAST({h} AS HUGEINT) % 4503599627370496) * 4096 + 2048
              AS DOUBLE) AS d
  FROM hhs),
hex AS (
  SELECT {g}idx, d, CAST(floor(log2(d)) AS BIGINT) AS eg FROM hrk),
hex2 AS (
  SELECT {g}idx,
         CASE WHEN pow(2.0, eg) > d THEN eg - 1
              WHEN pow(2.0, eg + 1) <= d THEN eg + 1
              ELSE eg END AS e
  FROM hex),
reg AS (SELECT {g}idx, max(GREATEST(LEAST(64 - e, 53), 1)) AS m
        FROM hex2 GROUP BY {g}idx),
hest AS (
  SELECT {g}{m} - count(*) AS z,
         {alpha} * {m} * {m}
           / (sum(pow(2.0, -CAST(m AS DOUBLE))) + ({m} - count(*)) * 1.0)
           AS raw_e
  FROM reg {f"GROUP BY {grp_cols}" if grp_cols else ""})"""


HLL_EST_EXPR = (
    "CASE WHEN raw_e <= 10240.0 AND z > 0 THEN 4096.0 * ln(4096.0 / z) "
    "ELSE raw_e END"
)


def hll_distinct_users_sql() -> str:
    """queries_ext.hll_distinct_users: HLL estimate replayed register-for-
    register (user_id is BIGINT so the int path of _hash64 applies), exact
    distinct from SQL, rel_err from the UNROUNDED estimate (matching the
    Python expression order)."""
    return f"""
WITH du AS (SELECT DISTINCT user_id FROM events),
{hll_register_ctes('du', 'user_id')},
fin AS (SELECT {HLL_EST_EXPR} AS est,
               (SELECT count(*) FROM du) AS exact
        FROM hest)
SELECT round_even(est, 1) AS estimate, exact,
       round_even(abs(est - exact) / greatest(1, exact), 4) AS rel_err
FROM fin
"""


def hll_distinct_per_type_sql() -> str:
    """queries_ext.hll_distinct_per_type: grouped HLL replay. rel_err is
    computed from the ROUNDED estimate (the pandas expression rounds
    `estimate` in place before deriving rel_err)."""
    return f"""
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
{hll_register_ctes('du', 'user_id', grp_cols='event_type')},
ex AS (SELECT event_type, count(*) AS exact FROM du GROUP BY event_type),
fin AS (SELECT e.event_type, round_even({HLL_EST_EXPR}, 1) AS estimate,
               ex.exact
        FROM hest e JOIN ex USING (event_type))
SELECT event_type, estimate, exact,
       round_even(abs(estimate - exact) / greatest(1, exact), 4) AS rel_err
FROM fin ORDER BY event_type
"""


def uniform_expr(hash_col: str) -> str:
    """U[0,1) float64 from a hash column — ``(h >> 11) / 2^53`` is an exact
    IEEE division, so numpy and DuckDB agree bit-for-bit."""
    return f"(CAST(({hash_col} >> 11) AS DOUBLE) / 9007199254740992.0)"


def randint_expr(hash_col: str, lo: int, hi: int) -> str:
    """Integer in [lo, hi) from a hash column (rng.randint parity)."""
    return f"({lo} + CAST({hash_col} % {hi - lo} AS BIGINT))"


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


def span_kind_stats_sql(n_docs: int = 2000, seed: int = 42) -> str:
    """Per-kind span census over the interleaved fixture, regenerated in
    SQL: fixtures.documents.documents_batch's span layout (n_spans, kind,
    word picks) is pure splitmix64 integer math, so the kind counts and
    char sums are reproducible bit-exactly without the corpus."""
    from ..fixtures.documents import _VOCAB

    lens = "[" + ", ".join(str(len(w)) for w in _VOCAB) + "]"
    nv = len(_VOCAB)
    h_ns, c_ns = hash_u64_cols("id", seed, 1, "ns")
    h_k, c_k = hash_u64_cols("span_key", seed, 2, "kk")
    h1, c1 = hash_u64_cols("span_key", seed, 3, "w1")
    h2, c2 = hash_u64_cols("span_key", seed, 4, "w2")
    h3, c3 = hash_u64_cols("span_key", seed, 5, "w3")
    return f"""
WITH ids AS (SELECT CAST(range AS BIGINT) AS id FROM range({n_docs})),
ns AS (SELECT id, {h_ns}, {randint_expr(c_ns, 1, 9)} AS n_spans FROM ids),
sp AS (SELECT id, unnest(range(n_spans)) AS ord FROM ns),
sk AS (SELECT id * 131 + ord AS span_key, ord FROM sp),
kx AS (SELECT span_key, {h_k},
              CASE WHEN ord = 0 THEN 0 ELSE {randint_expr(c_k, 0, 3)} END AS kind_ix
       FROM sk),
ch AS (SELECT kind_ix, {h1}, {h2}, {h3},
              CASE WHEN kind_ix = 0 THEN
                     list_extract({lens}, {randint_expr(c1, 0, nv)} + 1)
                   + list_extract({lens}, {randint_expr(c2, 0, nv)} + 1)
                   + list_extract({lens}, {randint_expr(c3, 0, nv)} + 1) + 2
                   ELSE 0 END AS chars
       FROM kx)
SELECT CASE kind_ix WHEN 0 THEN 'text' WHEN 1 THEN 'image' ELSE 'audio' END AS kind,
       count(*) AS n, CAST(sum(chars) AS BIGINT) AS chars
FROM ch GROUP BY kind_ix
"""


def validate_schedules_sql(
    n_rotations: int = 60, seed: int = 42, invalid_frac: float = 0.3
) -> str:
    """Schedule validator over the splitmix-generated rotations fixture.

    Only the harvest-pairing rule can fire on this fixture (years are
    continuous and dates monotonic by construction; the broken variant
    drops year 1's harvest op), and it fires iff year 1's crop never
    recurs in a later year — reproduced here by regenerating the per-year
    crop draws and checking for that rescue."""
    h_ny, c_ny = hash_u64_cols("r", seed, 60, "ny")
    h_br, c_br = hash_u64_cols("r", seed, 61, "br")
    h_cr, c_cr = hash_u64_cols("k", seed, 62, "cr")
    return f"""
WITH rot AS (SELECT CAST(range AS BIGINT) AS r FROM range({n_rotations})),
ny AS (SELECT r, {h_ny}, {randint_expr(c_ny, 1, 4)} AS n_years,
              {h_br}, {uniform_expr(c_br)} < {invalid_frac} AS broken
       FROM rot),
yr AS (SELECT r, broken, 1 + unnest(range(n_years)) AS y FROM ny),
cc AS (SELECT r, broken, y, r * 101 + y AS k FROM yr),
cr AS (SELECT r, broken, y, {h_cr}, {randint_expr(c_cr, 1, 5)} AS crop FROM cc),
c1 AS (SELECT r, broken, crop AS crop1 FROM cr WHERE y = 1),
rescue AS (SELECT DISTINCT a.r FROM c1 a JOIN cr b
           ON b.r = a.r AND b.y > 1 AND b.crop = a.crop1),
v AS (SELECT c1.r, c1.crop1, (c1.broken AND rescue.r IS NULL) AS bad
      FROM c1 LEFT JOIN rescue ON rescue.r = c1.r)
SELECT 'rot-' || lpad(CAST(r AS VARCHAR), 5, '0') AS opc_id,
       NOT bad AS is_valid,
       CASE WHEN bad THEN 'Crop ' || CAST(crop1 AS VARCHAR)
                          || ' does not have any harvest codes'
            ELSE '' END AS message
FROM v
"""


def validate_weather_daily_sql(
    n_grids: int = 8, start_year: int = 2019, end_year: int = 2020,
    gap_mod: int = 211,
) -> str:
    """DLY missing-dates validator: the Ray query drops fixture rows whose
    key (grid*100003 + doy + year) hits gap_mod, so the validator's
    missing-row counts are data-dependent; the fixture's value columns are
    in physical range by construction, so only that rule can fire."""
    return f"""
WITH days AS (
  SELECT year(d) AS yr, dayofyear(d) AS doy
  FROM (SELECT generate_series AS d
        FROM generate_series(DATE '{start_year}-01-01',
                             DATE '{end_year}-12-31', INTERVAL 1 DAY))
),
g AS (SELECT CAST(range AS BIGINT) AS grid_id FROM range({n_grids})),
miss AS (
  SELECT grid_id,
         count(*) FILTER (WHERE (grid_id * 100003 + doy + yr) % {gap_mod} = 0)
           AS nmiss
  FROM g CROSS JOIN days GROUP BY grid_id
)
SELECT grid_id, nmiss = 0 AS is_valid,
       CASE WHEN nmiss > 0
            THEN 'Missing rows for ' || CAST(nmiss AS VARCHAR) || ' dates'
            ELSE '' END AS message
FROM miss
"""


def validate_soil_sql(seed: int = 42) -> str:
    """SOL validator over the splitmix-generated soil fixture
    (fixtures/soil.py soil_polygons_table), regenerated in SQL.

    The header rules (albedo, hydrological group, layer count) cannot
    fire — the fixture draws them inside their legal ranges by
    construction — so the oracle replays only the per-layer range
    cascade, in the reference's rule order with first-violation-wins
    semantics (inputs.py:104-153). The found-value text relies on Python
    repr and DuckDB's VARCHAR cast both printing shortest-round-trip
    doubles; Layer_depth's cumulative sum is windowed (summation-order
    deviations are killed by the fixture's round-to-3)."""
    from ..fixtures.soil import _RANGES, LAYER_COLUMNS
    from ..stages.validate import SOL_LAYER_RULES

    h_nl, c_nl = hash_u64_cols("mukey", seed, 22, "nl")
    h_st, c_st = hash_u64_cols("lkey", seed, 23, "st")
    frags = [h_st]
    vals = {}
    for j, c in enumerate(LAYER_COLUMNS[1:]):
        lo, hi = _RANGES[c]
        h, hc = hash_u64_cols("lkey", seed, 30 + j, f"c{j}")
        frags.append(h)
        vals[c] = f"({lo!r} + {uniform_expr(hc)} * ({hi!r} - {lo!r}))"
    vals["Layer_depth"] = (
        f"round_even(0.01 + sum({uniform_expr(c_st)} * 0.9 + 0.1) OVER "
        "(PARTITION BY mukey ORDER BY ord ROWS BETWEEN UNBOUNDED PRECEDING "
        "AND CURRENT ROW), 3)"
    )
    branches = []
    for col, lo, hi, zero_ok in SOL_LAYER_RULES:
        ok = f"(v_{col} >= {lo!r} AND v_{col} <= {hi!r})"
        if zero_ok:
            ok = f"(v_{col} = 0 OR {ok})"
        branches.append(
            f"WHEN NOT {ok} THEN '{col} should be between {lo} and {hi}. "
            f"Found ' || CAST(v_{col} AS VARCHAR) || ' at index ' || "
            "CAST(ord AS VARCHAR) || '.'"
        )
    val_cols = ", ".join(f"{e} AS v_{c}" for c, e in vals.items())
    return f"""
WITH mk AS (SELECT CAST(range AS BIGINT) AS mukey FROM range(600)),
nl AS (SELECT mukey, {h_nl}, {randint_expr(c_nl, 1, 11)} AS n_layers FROM mk),
lay0 AS (SELECT mukey, unnest(range(n_layers)) AS ord FROM nl),
lay1 AS (SELECT mukey, ord, mukey * 37 + ord AS lkey FROM lay0),
lay2 AS (SELECT mukey, ord, {", ".join(frags)} FROM lay1),
lay AS (SELECT mukey, ord, {val_cols} FROM lay2),
msgs AS (
  SELECT mukey, ord,
         CASE {" ".join(branches)} ELSE NULL END AS msg
  FROM lay
),
firstbad AS (
  SELECT mukey, msg,
         row_number() OVER (PARTITION BY mukey ORDER BY ord) AS rn
  FROM msgs WHERE msg IS NOT NULL
)
SELECT mk.mukey, f.msg IS NULL AS is_valid, COALESCE(f.msg, '') AS message
FROM mk LEFT JOIN (SELECT mukey, msg FROM firstbad WHERE rn = 1) f
  USING (mukey)
"""


def embedding_pairs_sql(
    threshold: float = 0.9, n_twins: int = 32, seed: int = 9000,
    stream: int = 3, scale: float = 0.04,
) -> str:
    """All-pairs exact-cosine >= threshold over the embeddings table
    augmented with deterministic multiplicative-jitter twins of the first
    ``n_twins`` vectors: twin_j = float32(x_j * (1 + scale*(2u-1))) with
    u = splitmix64-uniform(vec_id*64 + j) — pure per-element arithmetic
    (no reductions), so numpy and DuckDB produce bit-identical float32
    twins. Cosine rounded half-to-even to 6 on both sides; valid as the
    LSH query's oracle because every true pair here has cosine ~0.9996
    (miss probability < 1e-6 at 8 tables x 12 planes) and the nearest
    natural pair sits below 0.61."""
    frag, h = hash_u64_cols("(e.vec_id * 64 + (t.j - 1))", seed, stream, "tw")
    u = uniform_expr(h)
    return f"""
WITH nat AS (
  SELECT e.vec_id, t.j, CAST(e.embedding[CAST(t.j AS INT)] AS DOUBLE) AS x
  FROM embeddings e, unnest(generate_series(1, len(e.embedding))) t(j)
),
twin AS (
  SELECT vec_id, j, x FROM (
    SELECT {frag},
           e.vec_id + 1000000 AS vec_id, t.j,
           CAST(CAST(CAST(e.embedding[CAST(t.j AS INT)] AS DOUBLE)
                * (1.0 + {scale} * ({u} * 2.0 - 1.0)) AS REAL) AS DOUBLE) AS x
    FROM embeddings e, unnest(generate_series(1, len(e.embedding))) t(j)
    WHERE e.vec_id < {n_twins}
  )
),
vecs AS (SELECT * FROM nat UNION ALL SELECT * FROM twin),
norms AS (SELECT vec_id, greatest(sqrt(sum(x * x)), 1e-12) AS nrm
          FROM vecs GROUP BY 1),
nv AS (SELECT v.vec_id, v.j, v.x / n.nrm AS u
       FROM vecs v JOIN norms n USING (vec_id)),
sims AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.u * b.u) AS c
  FROM nv a JOIN nv b ON a.j = b.j AND a.vec_id < b.vec_id
  GROUP BY 1, 2 HAVING sum(a.u * b.u) >= {threshold}
)
SELECT id_a, id_b, round_even(c, 6) AS cosine FROM sims ORDER BY id_a, id_b
"""


def cms_token_counts_sql(
    depth: int = 4, width: int = 1 << 14, min_n: int = 50, top_k: int = 20,
) -> str:
    """queries_ext2.cms_token_counts: the count-min sketch replayed in SQL.
    Token keys are FNV-1a-over-codepoints + splitmix finisher (seed 0, so
    the seed-gamma prepend is a no-op) — stages/dedup._token_hashes; row
    counters are sums over ALL tokens colliding into (row, col) with
    col = splitmix64((key + row*GAMMA) mod 2^64) mod width; the estimate
    is the min over rows. Pure integer math end to end — bit-exact, and
    merge order (per-batch sketches vs one global table) cannot matter
    because integer addition is associative."""
    fold = (
        "list_reduce(list_prepend("
        f"CAST({FNV_OFF} AS UBIGINT), "
        "list_transform(range(1, length(tok) + 1), "
        "i -> CAST(unicode(substr(tok, i, 1)) AS UBIGINT))), "
        "(acc, cp) -> CAST((CAST(xor(acc, cp) AS HUGEINT) * "
        f"{FNV_PRIME}) % {M64} AS UBIGINT))"
    )
    salted = (
        f"CAST((CAST(v4 AS HUGEINT) + (CAST(r AS HUGEINT) * {GAMMA}) % {M64})"
        f" % {M64} AS UBIGINT)"
    )
    frag, h = splitmix64_cols(salted, "cm")
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
cnt AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
top AS (SELECT tok, n FROM cnt WHERE n >= {min_n}
        ORDER BY n DESC, tok ASC LIMIT {top_k}),
k0 AS (SELECT tok, n, {fold} AS v FROM cnt),
k1 AS (SELECT tok, n, xor(v, v >> 30) AS v FROM k0),
k2 AS (SELECT tok, n, {_u64mul('v', MIX1)} AS v FROM k1),
k3 AS (SELECT tok, n, xor(v, v >> 27) AS v FROM k2),
k4 AS (SELECT tok, n, {_u64mul('v', MIX2)} AS v FROM k3),
keyed AS (SELECT tok, n, xor(v, v >> 31) AS v4 FROM k4),
cols AS (
  SELECT tok, n, r, CAST({h} % {width} AS BIGINT) AS col
  FROM (SELECT tok, n, v4, CAST(range AS UBIGINT) AS r, {frag}
        FROM keyed CROSS JOIN range({depth}))
),
tbl AS (SELECT r, col, sum(n) AS c FROM cols GROUP BY r, col),
est AS (
  SELECT t.tok, CAST(min(tb.c) AS BIGINT) AS cms_n
  FROM (SELECT c2.tok, c2.r, c2.col FROM cols c2 JOIN top USING (tok)) t
  JOIN tbl tb ON tb.r = t.r AND tb.col = t.col
  GROUP BY t.tok
)
SELECT top.tok, top.n AS exact_n, est.cms_n, est.cms_n >= top.n AS one_sided_ok
FROM top JOIN est USING (tok)
"""


def weather_term_ctes(seed: int = 42) -> str:
    """CTE chain regenerating ``fixtures/weather.weather_daily_table``'s
    tmax/tmin for year 2019, months 4-10, over the decimated grid sample
    (every 8th cell) — the exact input of ``pipelines/simulate.
    heat_units_table``. The fixture's float32 casts absorb libm ulp noise
    (sin/exp differences between numpy and DuckDB are ~2^-52 relative,
    float32 rounding is 2^-24), so the REAL-cast values are bit-identical
    to the parquet-side float32s. Produces ``hu(sgid, heat_units)``."""
    from ..geo.extent import WEATHER_NCOLS, WEATHER_NROWS

    ng = WEATHER_NROWS * WEATHER_NCOLS
    h40, c40 = hash_u64_cols("wkey", seed, 40, "u40")
    h41, c41 = hash_u64_cols("wkey", seed, 41, "u41")
    return f"""
wg AS (SELECT CAST(range AS BIGINT) * 8 AS sgid FROM range({(ng + 7) // 8})),
wd AS (SELECT generate_series AS d
       FROM generate_series(DATE '2019-01-01', DATE '2019-12-31',
                            INTERVAL 1 DAY)
       WHERE month(generate_series) BETWEEN 4 AND 10),
wk AS (SELECT sgid, sgid * 100003 + dayofyear(d) + 2019 AS wkey,
              sin((dayofyear(d) - 105) / 365.0 * 2 * pi()) AS season
       FROM wg CROSS JOIN wd),
wv AS (SELECT sgid,
              12.0 + 14.0 * season + (sgid % 17) * 0.3 AS base_t,
              {h40}, {h41}
       FROM wk),
wt AS (SELECT sgid,
              CAST(CAST(base_t + 6.0 + {uniform_expr(c40)} * 6.0 AS REAL)
                   AS DOUBLE) AS tmax,
              CAST(CAST(base_t - 6.0 - {uniform_expr(c41)} * 6.0 AS REAL)
                   AS DOUBLE) AS tmin
       FROM wv),
hu AS (SELECT sgid, sum(greatest((tmax + tmin) / 2 - 5.0, 0.0)) AS heat_units
       FROM wt GROUP BY sgid)"""


def soil_quality_cte(seed: int = 42) -> str:
    """``pipelines/simulate.soil_quality_table`` in SQL: mean of the
    fixture layers' Organic_Carbon draws (stream 38 = column index 8 of
    LAYER_COLUMNS[1:]) per mukey, / 10, round-even 6 — the same rounding
    the engine applies, so downstream consumers see identical doubles.
    Produces ``sq(mukey, soil_quality)``."""
    from ..fixtures.soil import _RANGES
    from ..geo.extent import SOIL_NCOLS, SOIL_NROWS

    lo, hi = _RANGES["Organic_Carbon"]
    h_nl, c_nl = hash_u64_cols("mukey", seed, 22, "snl")
    h_oc, c_oc = hash_u64_cols("lkey", seed, 38, "soc")
    return f"""
smk AS (SELECT CAST(range AS BIGINT) AS mukey
        FROM range({SOIL_NROWS * SOIL_NCOLS})),
snl AS (SELECT mukey, {h_nl}, {randint_expr(c_nl, 1, 11)} AS n_layers
        FROM smk),
slay AS (SELECT mukey, mukey * 37 + unnest(range(n_layers)) AS lkey FROM snl),
soc AS (SELECT mukey, {h_oc},
               ({lo!r} + {uniform_expr(c_oc)} * ({hi!r} - {lo!r})) AS oc
        FROM slay),
sq AS (SELECT mukey, round_even(avg(oc) / 10.0, 6) AS soil_quality
       FROM soc GROUP BY mukey)"""


def rasterize_yield_tiles_sql(
    knn_cte: str, mukey_expr: str, tile_expr: str,
) -> str:
    """queries_ext.rasterize_yield_tiles: the pseudo-EPIC fleet replayed in
    SQL — per-doc enrich (PIP mukey / kNN grid / tile), soil-quality and
    seasonal-heat side tables regenerated from their splitmix fixtures,
    ``pipelines/simulate.pseudo_yield`` inlined (round-even 4), then the
    per-tile mean. The heat lookup snaps a grid id UP to the next
    materialized sample cell (searchsorted-left semantics, clamped to the
    last sample), exactly as heat_units_table's reindex does. Sum-order
    differences between the engine's pairwise partials and SQL's
    sequential SUM sit ~8 orders of magnitude under the round-even
    tolerances (see heat_units_table)."""
    from ..geo.extent import N_TILE_COLS, WEATHER_NCOLS, WEATHER_NROWS

    ng = WEATHER_NROWS * WEATHER_NCOLS
    n_sample = (ng + 7) // 8
    return f"""
WITH {knn_cte},
{weather_term_ctes().lstrip()},
{soil_quality_cte().lstrip()},
docs_geo AS (
  SELECT d.doc_id, {mukey_expr} AS mukey, knn.grid_id,
         {tile_expr} AS tile_id
  FROM documents d JOIN knn ON d.doc_id = knn.doc_id
),
snapped AS (
  SELECT doc_id, mukey, tile_id,
         8 * least((grid_id + 7) // 8, {n_sample - 1}) AS sgid,
         grid_id
  FROM docs_geo
),
yields AS (
  SELECT g.tile_id,
         round_even(
           (2.0 + 6.0 * sq.soil_quality)
             * (1.0 - exp(-hu.heat_units / 2000.0))
           + CAST((g.mukey * 31 + g.grid_id * 17) % 97 AS DOUBLE) / 970.0,
           4) AS y
  FROM snapped g
  JOIN sq USING (mukey)
  JOIN hu USING (sgid)
)
SELECT tile_id, tile_id // {N_TILE_COLS} AS tile_row,
       tile_id % {N_TILE_COLS} AS tile_col,
       count(*) AS n_docs,
       round_even(sum(y) / count(*), 4) AS mean_yield
FROM yields GROUP BY tile_id
"""


def opc_phu_update_sql(
    n_rotations: int = 40, seed: int = 42, start_year: int = 2018,
    years: tuple[int, int] = (2018, 2020),
) -> str:
    """queries_ext.opc_phu_update: the schedule fixture regenerated in SQL
    (same streams as fixtures/schedules.schedules_table), the reference's
    season pairing (each plantation row -> first same-crop harvest
    strictly after, within the rotation), and OPV1 = sum of
    clip(0.5*(tmax+tmin) - (5 + crop), 0) over grid-0 weather days
    strictly between — weather terms bit-identical via the float32-cast
    regen (see weather_term_ctes). Both sides round OPV1 half-to-even to
    4 (summation-order noise ~1e-13 vs 5e-5 tolerance)."""
    h_ny, c_ny = hash_u64_cols("r", seed, 60, "ny")
    h_cr, c_cr = hash_u64_cols("k", seed, 62, "cr")
    h_pm, c_pm = hash_u64_cols("k", seed, 63, "pm")
    h_pd, c_pd = hash_u64_cols("k", seed, 64, "pd")
    h_hm, c_hm = hash_u64_cols("k", seed, 65, "hm")
    h_hd, c_hd = hash_u64_cols("k", seed, 66, "hd")
    h_rt, c_rt = hash_u64_cols("k", seed, 67, "rt")
    h_pc, c_pc = hash_u64_cols("k", seed, 68, "pc")
    h40, c40 = hash_u64_cols("wkey", seed, 40, "u40")
    h41, c41 = hash_u64_cols("wkey", seed, 41, "u41")
    opv_rest = ", ".join(f"0.0 AS OPV{i}" for i in range(2, 9))
    return f"""
WITH rot AS (SELECT CAST(range AS BIGINT) AS r FROM range({n_rotations})),
ny AS (SELECT r, {h_ny}, {randint_expr(c_ny, 1, 4)} AS n_years FROM rot),
yrs AS (SELECT r, 1 + unnest(range(n_years)) AS y FROM ny),
kk AS (SELECT r, CAST(y AS INTEGER) AS y, r * 101 + y AS k FROM yrs),
draw AS (
  SELECT r, y,
         {h_cr}, {randint_expr(c_cr, 1, 5)} AS crop,
         {h_pm}, {randint_expr(c_pm, 4, 6)} AS plant_m,
         {h_pd}, {randint_expr(c_pd, 1, 28)} AS plant_day,
         {h_hm}, {randint_expr(c_hm, 9, 11)} AS harv_m,
         {h_hd}, {randint_expr(c_hd, 1, 28)} AS harv_day,
         {h_rt}, round_even({uniform_expr(c_rt)} * 150.0, 2) AS rate,
         {h_pc}, 2 + {randint_expr(c_pc, 0, 3)} AS plant_code
  FROM kk),
sched AS (
  SELECT r, y AS Yid, plant_m AS Mn, plant_day AS Dy,
         CAST(plant_code AS INTEGER) AS CODE, 1 AS TRAC, crop, 0 AS XMTU,
         rate AS opv1_0
  FROM draw
  UNION ALL
  SELECT r, y, plant_m + 1, 10, 71, 2, crop, 0, rate * 0.5 FROM draw
  UNION ALL
  SELECT r, y, harv_m, harv_day, 650, 3, crop, 0, 0.0 FROM draw
),
dated AS (
  SELECT *, make_date({start_year} + Yid - 1, Mn, Dy) AS dt FROM sched
),
wd AS (SELECT generate_series AS d
       FROM generate_series(DATE '{years[0]}-01-01',
                            DATE '{years[1]}-12-31', INTERVAL 1 DAY)),
wk AS (SELECT d, dayofyear(d) + year(d) AS wkey,
              sin((dayofyear(d) - 105) / 365.0 * 2 * pi()) AS season
       FROM wd),
wv AS (SELECT d, 12.0 + 14.0 * season AS base_t, {h40}, {h41} FROM wk),
wt AS (SELECT d,
              CAST(CAST(base_t + 6.0 + {uniform_expr(c40)} * 6.0 AS REAL)
                   AS DOUBLE) AS tmax,
              CAST(CAST(base_t - 6.0 - {uniform_expr(c41)} * 6.0 AS REAL)
                   AS DOUBLE) AS tmin
       FROM wv),
pl AS (SELECT r, Yid, dt AS pdate, crop FROM dated WHERE CODE IN (2, 3, 4)),
hv AS (SELECT r, crop, dt AS hdate FROM dated WHERE CODE = 650),
pair AS (
  SELECT p.r, p.Yid, p.crop, p.pdate, min(h.hdate) AS hdate
  FROM pl p LEFT JOIN hv h
    ON h.r = p.r AND h.crop = p.crop AND h.hdate > p.pdate
  GROUP BY p.r, p.Yid, p.crop, p.pdate
),
phu AS (
  SELECT pr.r, pr.Yid, pr.crop,
         COALESCE(sum(greatest(0.5 * (w.tmax + w.tmin)
                               - (5.0 + pr.crop), 0.0)), 0.0) AS hu
  FROM pair pr LEFT JOIN wt w ON w.d > pr.pdate AND w.d < pr.hdate
  WHERE pr.hdate IS NOT NULL
  GROUP BY pr.r, pr.Yid, pr.crop, pr.hdate
)
SELECT 'rot-' || lpad(CAST(s.r AS VARCHAR), 5, '0') AS opc_id,
       {start_year} AS start_year, s.Yid, s.Mn, s.Dy, s.CODE,
       s.TRAC, s.crop AS CRP, s.XMTU,
       round_even(CASE WHEN s.CODE IN (2, 3, 4) AND p.hu IS NOT NULL
                       THEN p.hu ELSE s.opv1_0 END, 4) AS OPV1,
       {opv_rest}
FROM sched s
LEFT JOIN phu p ON p.r = s.r AND p.Yid = s.Yid AND s.CODE IN (2, 3, 4)
"""


def smooth_profile_sql() -> str:
    """queries_ext.smooth_profile: per-user daily-mean series -> Savitzky-
    Golay (w=5, p=2, scipy 'interp' edges) -> rounded mean, plus the
    season count (peaks above the 75th percentile, min-distance greedy).

    The savgol weights are the EXACT rationals the pseudo-inverse
    approximates (center kernel (-3,12,17,12,-3)/35; edge rows of the
    quadratic LS smoothing matrix over the first/last window, denominator
    700 = det of the normal matrix) — numpy's SVD-computed doubles differ
    by ~1e-16, absorbed by round-even 6 of the series mean. quantile_cont
    is bit-identical to numpy's linear interpolation (verified across
    sizes). The greedy peak keep (highest first, ties by position,
    reject within ceil(n/4)) runs as a RECURSIVE CTE over rank-ordered
    candidates with a single-level lambda for the distance test — nested
    lambdas (a list_filter inside a list_reduce lambda) segfault /
    silently corrupt on this DuckDB build; never nest lambdas in oracle
    SQL."""
    return """
WITH RECURSIVE daily AS (
  SELECT user_id, date_trunc('day', ts) AS d, avg(value) AS v
  FROM events GROUP BY user_id, date_trunc('day', ts)
),
ser AS (
  SELECT user_id, list(v ORDER BY d) AS ys, count(*) AS n,
         quantile_cont(v, 0.75) AS h
  FROM daily GROUP BY user_id
),
smo AS (
  SELECT user_id, n,
    CASE WHEN n < 7 THEN 0.0 ELSE round_even(list_sum(
      list_transform(range(1, n + 1), i -> CASE
        WHEN i = 1 THEN (620*ys[1] + 180*ys[2] - 60*ys[3]
                         - 100*ys[4] + 60*ys[5]) / 700.0
        WHEN i = 2 THEN (180*ys[1] + 260*ys[2] + 240*ys[3]
                         + 120*ys[4] - 100*ys[5]) / 700.0
        WHEN i = n - 1 THEN (-100*ys[n-4] + 120*ys[n-3] + 240*ys[n-2]
                             + 260*ys[n-1] + 180*ys[n]) / 700.0
        WHEN i = n THEN (60*ys[n-4] - 100*ys[n-3] - 60*ys[n-2]
                         + 180*ys[n-1] + 620*ys[n]) / 700.0
        ELSE (-3*ys[i-2] + 12*ys[i-1] + 17*ys[i]
              + 12*ys[i+1] - 3*ys[i+2]) / 35.0
      END)) / n, 6) END AS smoothed_mean
  FROM ser
),
cands AS (
  SELECT user_id, pos, dist,
         row_number() OVER (PARTITION BY user_id ORDER BY y DESC, pos) AS rnk
  FROM (
    SELECT user_id, p AS pos, ys[p] AS y,
           CAST(ceil(n / 4.0) AS BIGINT) AS dist
    FROM ser, unnest(range(2, n)) t(p)
    WHERE n >= 7 AND ys[p] > ys[p - 1] AND ys[p] > ys[p + 1]
      AND ys[p] >= h
  )
),
nc AS (SELECT user_id, count(*) AS m FROM cands GROUP BY user_id),
greedy AS (
  SELECT user_id, 0 AS rnk, CAST([] AS BIGINT[]) AS kept FROM nc
  UNION ALL
  SELECT g.user_id, g.rnk + 1,
         CASE WHEN len(list_filter(g.kept,
                    q -> abs(q - c.pos) < c.dist)) = 0
              THEN list_append(g.kept, c.pos) ELSE g.kept END
  FROM greedy g JOIN cands c
    ON c.user_id = g.user_id AND c.rnk = g.rnk + 1
),
nsea AS (
  SELECT g.user_id, len(g.kept) AS n_seasons
  FROM greedy g JOIN nc ON nc.user_id = g.user_id AND nc.m = g.rnk
)
SELECT s.user_id, CAST(COALESCE(nsea.n_seasons, 0) AS BIGINT) AS n_seasons,
       s.smoothed_mean
FROM smo s LEFT JOIN nsea USING (user_id)
"""


def profile_lai_sql(cdl_mod: int = 3, cdl_code: int = 1) -> str:
    """queries_ext4.profile_lai: the reference's LAI-profile orchestration
    (geoEpic/utils/profile.py:306-393 profile_lai_from_csv ->
    process_ndvi_data) replayed end to end: per-field daily mean series,
    daily reindex + rolling-median outlier removal + linear interpolation
    (profile.py:12-76, pandas semantics: windows containing a hole yield
    no median -> no outlier flag; leading NaNs stay NaN, trailing NaNs
    forward-fill — verified against pandas), the >0 filter, and the
    per-Month_Day p10/p90/mean distribution (process_ndvi_data uses
    percentile 10/90 despite its 5th/95th labels — bug-parity kept).
    Single-level lambdas only (the list_filter sits in a plain SELECT,
    never inside another lambda — the DuckDB nesting trap)."""
    return f"""
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS d, avg(value) AS v
  FROM events WHERE user_id % {cdl_mod} = {cdl_code}
  GROUP BY user_id, date_trunc('day', ts)
),
bounds AS (SELECT user_id, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1),
grid AS (
  SELECT user_id, d0,
         unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d
  FROM bounds
),
ser AS (
  SELECT g.user_id, datediff('day', g.d0, g.d) + 1 AS i, g.d, daily.v
  FROM grid g LEFT JOIN daily ON daily.user_id = g.user_id AND daily.d = g.d
),
arr AS (
  SELECT user_id, count(*) AS n, list(v ORDER BY i) AS ys,
         stddev_samp(v) * 2 AS cutoff
  FROM ser GROUP BY user_id
),
win AS (
  SELECT user_id, n, ys, cutoff,
         CASE WHEN n <= 21 THEN 3
              ELSE greatest(3, CASE WHEN (n // 7) % 2 = 0
                                    THEN n // 7 + 1 ELSE n // 7 END)
         END AS w
  FROM arr
),
pos AS (
  SELECT user_id, n, ys, cutoff, w, (w - 1) // 2 AS k,
         CAST(unnest(range(1, n + 1)) AS BIGINT) AS i
  FROM win
),
med AS (
  SELECT user_id, i, ys[i] AS v,
         CASE WHEN i > k AND i <= n - k
               AND len(list_filter(ys[i - k : i + k],
                                   x -> x IS NOT NULL)) = w
              THEN list_aggregate(ys[i - k : i + k], 'median') END AS m,
         cutoff
  FROM pos
),
cleaned AS (
  SELECT user_id, i,
         CASE WHEN COALESCE(abs(v - m) > cutoff, false) THEN NULL ELSE v END
           AS v2
  FROM med
),
itp AS (
  SELECT user_id, i, v2,
         last_value(v2 IGNORE NULLS) OVER w1 AS pv,
         last_value(CASE WHEN v2 IS NOT NULL THEN i END IGNORE NULLS)
           OVER w1 AS pi,
         first_value(v2 IGNORE NULLS) OVER w2 AS nv,
         first_value(CASE WHEN v2 IS NOT NULL THEN i END IGNORE NULLS)
           OVER w2 AS ni
  FROM cleaned
  WINDOW w1 AS (PARTITION BY user_id ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w2 AS (PARTITION BY user_id ORDER BY i
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
filled AS (
  SELECT t.user_id, b.d0 + (t.i - 1) * INTERVAL 1 DAY AS d,
         CASE WHEN t.v2 IS NOT NULL THEN t.v2
              WHEN t.pv IS NULL THEN NULL
              WHEN t.nv IS NULL THEN t.pv
              ELSE t.pv + (t.i - t.pi) * (t.nv - t.pv) / (t.ni - t.pi)
         END AS lai
  FROM itp t JOIN bounds b USING (user_id)
)
SELECT strftime(d, '%m-%d') AS month_day,
       {rnd("quantile_cont(lai, 0.10)", 6)} AS min_lai,
       {rnd("quantile_cont(lai, 0.90)", 6)} AS max_lai,
       {rnd("avg(lai)", 6)} AS mean_lai
FROM filled WHERE lai > 0 GROUP BY 1
"""


def simulation_fleet_sql(knn_cte: str, mukey_expr: str) -> str:
    """queries_ext.simulation_fleet: per-doc pseudo-EPIC yields — the
    same replay as rasterize_yield_tiles_sql without the tile collapse.
    pseudo_yield rounds half-to-even to 4 inside the kernel, so the
    per-doc values compare bit-exactly."""
    from ..geo.extent import WEATHER_NCOLS, WEATHER_NROWS

    ng = WEATHER_NROWS * WEATHER_NCOLS
    n_sample = (ng + 7) // 8
    return f"""
WITH {knn_cte},
{weather_term_ctes().lstrip()},
{soil_quality_cte().lstrip()},
docs_geo AS (
  SELECT d.doc_id, {mukey_expr} AS mukey, knn.grid_id
  FROM documents d JOIN knn ON d.doc_id = knn.doc_id
),
snapped AS (
  SELECT doc_id, mukey, grid_id,
         8 * least((grid_id + 7) // 8, {n_sample - 1}) AS sgid
  FROM docs_geo
)
SELECT g.doc_id, g.mukey, g.grid_id,
       round_even(
         (2.0 + 6.0 * sq.soil_quality)
           * (1.0 - exp(-hu.heat_units / 2000.0))
         + CAST((g.mukey * 31 + g.grid_id * 17) % 97 AS DOUBLE) / 970.0,
         4) AS "yield"
FROM snapped g
JOIN sq USING (mukey)
JOIN hu USING (sgid)
"""


def semdedup_keep_sql(
    k: int = 8, n_iter: int = 4, threshold: float = 0.9,
    n_twins: int = 32, seed: int = 9000, stream: int = 3,
    scale: float = 0.04,
) -> str:
    """queries_ext2.semdedup_keep fully replayed: splitmix twins (same
    regen as embedding_pairs_sql), the Lloyd rounds unrolled over the
    AUGMENTED vector set (init = k smallest vec_ids; empty clusters keep
    their centroid), one extra assignment against the post-update
    centroids (semdedup assigns with kmeans_fit's returned c{n}), then
    the within-cluster greedy keep-first sweep in ascending-id order as
    a RECURSIVE CTE (one step per member rank; the threshold test is a
    single-level lambda over the kept-vector list — nested lambdas
    segfault / silently corrupt on this DuckDB build). Numeric daylight
    (expanded-vs-direct distance forms, summation order) is ~1e-12, far
    inside both the Voronoi margins of this corpus and the
    |cosine - 0.9| >= 0.1 gap of every compared pair."""
    frag, h = hash_u64_cols("(e.vec_id * 64 + (t.j - 1))", seed, stream, "tw")
    u = uniform_expr(h)
    steps = []
    for i in range(1, n_iter + 2):
        # rounds 1..n_iter update centroids; round n_iter+1 is the final
        # assignment pass (no update consumed)
        steps.append(f"""d{i} AS (
  SELECT v.vec_id, c.cid, sum((v.x - c.val) * (v.x - c.val)) AS d2
  FROM v JOIN c{i - 1} c ON c.j = v.j GROUP BY 1, 2
),
a{i} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
    FROM d{i}
  ) WHERE rn = 1
),
c{i} AS (
  SELECT p.cid, p.j, COALESCE(m.mu, p.val) AS val
  FROM c{i - 1} p LEFT JOIN (
    SELECT a.cid, v.j, sum(v.x) / count(*) AS mu
    FROM a{i} a JOIN v ON v.vec_id = a.vec_id GROUP BY 1, 2
  ) m ON m.cid = p.cid AND m.j = p.j
)""")
    chain = ",\n".join(steps)
    return f"""
WITH RECURSIVE nat AS (
  SELECT e.vec_id, t.j, CAST(e.embedding[CAST(t.j AS INT)] AS DOUBLE) AS x
  FROM embeddings e, unnest(generate_series(1, len(e.embedding))) t(j)
),
twin AS (
  SELECT vec_id, j, x FROM (
    SELECT {frag},
           e.vec_id + 1000000 AS vec_id, t.j,
           CAST(CAST(CAST(e.embedding[CAST(t.j AS INT)] AS DOUBLE)
                * (1.0 + {scale} * ({u} * 2.0 - 1.0)) AS REAL) AS DOUBLE) AS x
    FROM embeddings e, unnest(generate_series(1, len(e.embedding))) t(j)
    WHERE e.vec_id < {n_twins}
  )
),
v AS MATERIALIZED (SELECT * FROM nat UNION ALL SELECT * FROM twin),
c0 AS MATERIALIZED (
  SELECT CAST(dense_rank() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
         j, x AS val
  FROM v WHERE vec_id IN (SELECT DISTINCT vec_id FROM v
                          ORDER BY vec_id LIMIT {k})
),
{chain},
nrm AS (SELECT vec_id, greatest(sqrt(sum(x * x)), 1e-12) AS nn
        FROM v GROUP BY vec_id),
vl AS (SELECT v.vec_id, list(v.x / n.nn ORDER BY v.j) AS uv
       FROM v JOIN nrm n USING (vec_id) GROUP BY v.vec_id),
mem AS MATERIALIZED (
  SELECT a.cid, a.vec_id, vl.uv,
         row_number() OVER (PARTITION BY a.cid ORDER BY a.vec_id) AS rnk
  FROM a{n_iter + 1} a JOIN vl USING (vec_id)),
msz AS (SELECT cid, count(*) AS m FROM mem GROUP BY cid),
gr AS (
  SELECT cid, 0 AS rnk, CAST([] AS BIGINT[]) AS kept_ids,
         CAST([] AS DOUBLE[][]) AS kept_uvs
  FROM msz
  UNION ALL
  SELECT cid, rnk,
         CASE WHEN conflict THEN kept_ids
              ELSE list_append(kept_ids, vid) END AS kept_ids,
         CASE WHEN conflict THEN kept_uvs
              ELSE list_append(kept_uvs, uv) END AS kept_uvs
  FROM (
    SELECT g.cid AS cid, g.rnk + 1 AS rnk, g.kept_ids, g.kept_uvs,
           mm.vec_id AS vid, mm.uv AS uv,
           len(list_filter(g.kept_uvs,
               ku -> list_inner_product(ku, mm.uv) >= {threshold})) > 0
             AS conflict
    FROM gr g JOIN mem mm ON mm.cid = g.cid AND mm.rnk = g.rnk + 1
  )
),
keptl AS (
  SELECT g.cid, g.kept_ids AS ids
  FROM gr g JOIN msz ON msz.cid = g.cid AND msz.m = g.rnk
)
SELECT m.vec_id, m.cid AS cluster_id,
       list_contains(ki.ids, m.vec_id) AS kept
FROM mem m JOIN keptl ki USING (cid)
ORDER BY m.vec_id
"""


def _fnv_fold_expr(e: str) -> str:
    """FNV-1a over the codepoints of string expression ``e`` (the
    state/manifest._fnv1a_codepoints kernel). Single-level lambdas only."""
    return (
        "list_reduce(list_prepend("
        f"CAST({FNV_OFF} AS UBIGINT), "
        f"list_transform(range(1, length({e}) + 1), "
        f"i -> CAST(unicode(substr({e}, i, 1)) AS UBIGINT))), "
        "(acc, cp) -> CAST((CAST(xor(acc, cp) AS HUGEINT) * "
        f"{FNV_PRIME}) % {M64} AS UBIGINT))"
    )


def span_roundtrip_sql(n_docs: int = 2000, seed: int = 42) -> str:
    """queries_ext2.span_roundtrip: the north-rule invariant gate. The
    oracle regenerates the interleaved fixture (same draws as
    span_kind_stats_sql plus the word/media/doc-id strings) and computes
    the ORACLE-GRADE span-sequence hash (state/manifest.span_hash_fnv):
    per-span FNV+finisher, per-doc Horner fold in span order (ascending
    offset = descending-order reduce of acc*B + h), doc-id FNV mixed in,
    XOR across docs, %016x. The Ray side must reproduce it from the
    EXPLODED-AND-REASSEMBLED corpus — a corrupted round trip changes
    hash_out and the driver's compare fails."""
    from ..fixtures.documents import _KINDS, _VOCAB

    nv = len(_VOCAB)
    vocab = "[" + ", ".join(f"'{w}'" for w in _VOCAB) + "]"
    kinds = "[" + ", ".join(f"'{k}'" for k in _KINDS) + "]"
    h_ns, c_ns = hash_u64_cols("id", seed, 1, "ns")
    h_k, c_k = hash_u64_cols("span_key", seed, 2, "kk")
    h1, c1 = hash_u64_cols("span_key", seed, 3, "w1")
    h2, c2 = hash_u64_cols("span_key", seed, 4, "w2")
    h3, c3 = hash_u64_cols("span_key", seed, 5, "w3")
    h6, c6 = hash_u64_cols("span_key", seed, 6, "mi")
    horner = _u64mul("acc", int(FNV_PRIME))
    return f"""
WITH ids AS (SELECT CAST(range AS BIGINT) AS id FROM range({n_docs})),
ns AS (SELECT id, {h_ns}, {randint_expr(c_ns, 1, 9)} AS n_spans FROM ids),
sp AS (SELECT id, CAST(unnest(range(n_spans)) AS BIGINT) AS ord FROM ns),
sk AS (SELECT id, ord, id * 131 + ord AS span_key FROM sp),
dr AS (SELECT id, ord, {h_k}, {h1}, {h2}, {h3}, {h6},
              CASE WHEN ord = 0 THEN 0 ELSE {randint_expr(c_k, 0, 3)} END
                AS kind_ix,
              {randint_expr(c1, 0, nv)} AS i1,
              {randint_expr(c2, 0, nv)} AS i2,
              {randint_expr(c3, 0, nv)} AS i3,
              {randint_expr(c6, 0, 1 << 31)} AS mid
       FROM sk),
fld AS (SELECT id, ord,
               list_extract({kinds}, kind_ix + 1)
                 || chr(31)
                 || CASE WHEN kind_ix = 0
                         THEN list_extract({vocab}, i1 + 1) || ' '
                              || list_extract({vocab}, i2 + 1) || ' '
                              || list_extract({vocab}, i3 + 1)
                         ELSE '' END
                 || chr(31)
                 || CASE WHEN kind_ix != 0
                         THEN 'media://' || CAST(mid AS VARCHAR)
                         ELSE '' END AS joined
        FROM dr),
sh0 AS (SELECT id, ord,
               CAST((CAST({_fnv_fold_expr('joined')} AS HUGEINT) + ord)
                    % {M64} AS UBIGINT) AS v
        FROM fld),
sh1 AS (SELECT id, ord, xor(v, v >> 30) AS v FROM sh0),
sh2 AS (SELECT id, ord, {_u64mul('v', MIX1)} AS v FROM sh1),
sh3 AS (SELECT id, ord, xor(v, v >> 27) AS v FROM sh2),
sh4 AS (SELECT id, ord, {_u64mul('v', MIX2)} AS v FROM sh3),
sh AS (SELECT id, ord, xor(v, v >> 31) AS h FROM sh4),
docfold AS (
  SELECT id,
         list_reduce(
           list_prepend(CAST(0 AS UBIGINT), list(h ORDER BY ord DESC)),
           (acc, h) -> CAST((CAST({horner} AS HUGEINT) + h) % {M64}
                            AS UBIGINT)) AS fold
  FROM sh GROUP BY id),
dh0 AS (SELECT id,
               CAST((CAST(fold AS HUGEINT) +
                     {_fnv_fold_expr("'doc-' || lpad(CAST(id AS VARCHAR), 10, '0')")})
                    % {M64} AS UBIGINT) AS v
        FROM docfold),
dh1 AS (SELECT id, xor(v, v >> 30) AS v FROM dh0),
dh2 AS (SELECT id, {_u64mul('v', MIX1)} AS v FROM dh1),
dh3 AS (SELECT id, xor(v, v >> 27) AS v FROM dh2),
dh4 AS (SELECT id, {_u64mul('v', MIX2)} AS v FROM dh3),
dh AS (SELECT id, xor(v, v >> 31) AS h FROM dh4),
agg AS (SELECT bit_xor(h) AS acc, count(*) AS n FROM dh)
SELECT CAST(n AS BIGINT) AS n_docs_in, CAST(n AS BIGINT) AS n_docs_out,
       lower(lpad(hex(acc), 16, '0')) AS hash_in,
       lower(lpad(hex(acc), 16, '0')) AS hash_out,
       true AS match
FROM agg
"""


def audio_stats_sql(n_refs: int = 200, seed: int = 42, rate: int = 8000) -> str:
    """queries_ext4.multimodal_audio_stats: the WAV payloads' PCM streams
    are splitmix draws (stages/multimodal.synth_audio_table), so the
    oracle regenerates every sample and recomputes n_samples / duration /
    RMS — a bit-exact check THROUGH a binary codec round trip (encode_wav
    -> actor-pool decode -> stats). The squared-sample sum stays under
    2^53, so float64 and HUGEINT agree exactly; sqrt ulp noise sits ~5
    orders under the round-even-6 tolerance."""
    h_n, c_n = hash_u64_cols("i", seed, 98, "an")
    h_s, c_s = hash_u64_cols("(i * 4096 + j)", seed, 97, "as")
    return f"""
WITH refs AS (SELECT CAST(range AS BIGINT) AS i FROM range({n_refs})),
lens AS (SELECT i, {h_n}, 400 + CAST({c_n} % 800 AS BIGINT) AS n FROM refs),
samp AS (SELECT i, n, CAST(unnest(range(n)) AS BIGINT) AS j FROM lens),
vals AS (SELECT i, n, {h_s},
                CAST({c_s} % 65536 AS BIGINT) - 32768 AS x
         FROM samp),
agg AS (SELECT i, n, sum(CAST(x AS HUGEINT) * x) AS ss FROM vals GROUP BY i, n)
SELECT 'aud-' || lpad(CAST(i AS VARCHAR), 5, '0') AS media_ref,
       n AS n_samples, {rate} AS sample_rate, 1 AS channels,
       round_even(n / {rate}.0, 6) AS duration_s,
       round_even(sqrt(CAST(ss AS DOUBLE) / n), 6) AS rms
FROM agg
"""


def winnow_pairs_sql(
    docs_cte: str, k: int = 5, window: int = 8,
    min_shared: int = 3, max_df: int = 16,
) -> str:
    """Winnowing overlap pairs (id_a, id_b, n_shared) of ``docs_cte(doc_id,
    text)`` — matching stages/text.winnow_overlap_pairs bit-exactly.

    The rolling k-gram hash (stages/dedup.char_rolling_hashes) is a
    weighted codepoint sum mod 2^64 + xorshift*GAMMA mix; its weight
    constants come from numpy's seeded generator and are inlined here as
    literals. Window-minimum selection is a SQL window function; texts
    shorter than k take the reference's single-shingle branch (weighted
    sum + n, unmixed)."""
    import numpy as np

    w = (np.random.default_rng(4321)
         .integers(1, 1 << 62, size=max(k, 16), dtype=np.uint64)
         | np.uint64(1))[:k]
    roll = " + ".join(f"cp[p + {j}] * {int(w[j])}" for j in range(k))
    wlist = "[" + ", ".join(str(int(x)) for x in w) + "]"
    hsum = f"CAST(({roll}) % {M64} AS UBIGINT)"
    mixed = _u64mul(f"xor({hsum}, {hsum} >> 31)", GAMMA)
    return f"""
codes AS (
  SELECT doc_id,
         list_transform(range(1, length(text) + 1),
                        i -> CAST(unicode(substr(text, i, 1)) AS HUGEINT)) AS cp
  FROM {docs_cte}
),
hs AS (
  SELECT doc_id,
    CASE WHEN len(cp) < {k} THEN
      [CAST((COALESCE(list_sum(list_transform(range(len(cp)),
                                j -> cp[j + 1] * {wlist}[j + 1])), 0)
             + len(cp)) % {M64} AS UBIGINT)]
    ELSE
      list_transform(range(1, len(cp) - {k} + 2), p -> {mixed})
    END AS hl
  FROM codes
),
hflat AS (
  SELECT doc_id, unnest(hl) AS h, generate_subscripts(hl, 1) AS pos,
         len(hl) AS n
  FROM hs
),
wmins AS (
  SELECT doc_id, pos, n,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS m
  FROM hflat
),
fp AS (
  SELECT DISTINCT doc_id, m AS f FROM wmins
  WHERE n > {window} AND pos <= n - {window} + 1
  UNION
  SELECT doc_id, min(h) AS f FROM hflat WHERE n <= {window} GROUP BY doc_id
),
df AS (SELECT f, count(*) AS d FROM fp GROUP BY f),
good AS (SELECT fp.doc_id, fp.f FROM fp JOIN df USING (f)
         WHERE df.d BETWEEN 2 AND {max_df})
"""


def grouped_tdigest_replay_sql(
    table: str = "events",
    grp: str = "event_type",
    col: str = "value",
    key_col: str = "event_id",
    qs: tuple[float, ...] = (0.1, 0.5, 0.9),
    delta: int = 100,
    n_buckets: int = 8,
) -> str:
    """Per-group generalization of tdigest_replay_sql, matching
    stages/sketches.grouped_binned_tdigest_quantiles bit-exactly: every
    window/partition gains the group column, the per-group merge keeps
    the fixed (m, bkt, bin) order, and the quantile read-out joins the
    unique (lo, hi) straddle row per (group, q) — cmid is strictly
    increasing within a group, so no LIMIT is needed. Also emits the
    exact quantile_cont per group and the absolute error, mirroring the
    gate query's columns."""

    def k1_bin(q_expr: str) -> str:
        return (
            f"CAST(floor({delta} * (asin(2 * ({q_expr}) - 1) / pi() + 0.5))"
            " AS BIGINT)"
        )

    pcols = [f"p{round(q * 100):02d}" for q in qs]
    ecols = [f"e{round(q * 100):02d}" for q in qs]
    pivot_p = ", ".join(
        f"max(CASE WHEN q = {q!r} THEN v END) AS {pc}_raw"
        for q, pc in zip(qs, pcols)
    )
    exact = ", ".join(
        f"quantile_cont({col}, {q!r}) AS {ec}_raw" for q, ec in zip(qs, ecols)
    )
    out_cols = ", ".join(
        f"round_even({pc}_raw, 4) AS {pc}, round_even({ec}_raw, 4) AS {ec},"
        f" round_even(abs({pc}_raw - {ec}_raw), 4) AS err_{pc}"
        for pc, ec in zip(pcols, ecols)
    )
    qlist = ", ".join(repr(q) for q in qs)
    return f"""
WITH ranked AS (
  SELECT {grp} AS grp, {key_col} % {n_buckets} AS bkt, {col} AS value,
         row_number() OVER (PARTITION BY {grp}, {key_col} % {n_buckets}
                            ORDER BY {col}) AS r,
         count(*) OVER (PARTITION BY {grp}, {key_col} % {n_buckets}) AS n
  FROM {table}
),
cent AS (
  SELECT grp, bkt, {k1_bin("(r - 0.5) / n")} AS bin,
         list_sum(list(value ORDER BY value)) / count(*) AS m,
         CAST(count(*) AS DOUBLE) AS w
  FROM ranked GROUP BY 1, 2, 3
),
run AS (
  SELECT grp, m, w, bkt, bin,
         sum(w) OVER (PARTITION BY grp ORDER BY m, bkt, bin
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(w) OVER (PARTITION BY grp) AS total
  FROM cent
),
cent2 AS (
  SELECT grp, {k1_bin("(cum - w / 2) / total")} AS bin2,
         list_sum(list(m * w ORDER BY m, bkt, bin)) / sum(w) AS m2,
         sum(w) AS w2, any_value(total) AS total
  FROM run GROUP BY 1, 2
),
final AS (
  SELECT grp, m2, total,
         sum(w2) OVER (PARTITION BY grp ORDER BY bin2
                       ROWS UNBOUNDED PRECEDING) - w2 / 2 AS cmid,
         row_number() OVER (PARTITION BY grp ORDER BY bin2) AS rn,
         count(*) OVER (PARTITION BY grp) AS nc
  FROM cent2
),
qv AS (SELECT unnest([{qlist}]) AS q),
bnd AS (SELECT grp, min(cmid) AS mn, max(cmid) AS mx,
               any_value(total) AS total
        FROM final GROUP BY 1),
firsts AS (SELECT grp, m2 AS m_first FROM final WHERE rn = 1),
lasts AS (SELECT grp, m2 AS m_last FROM final WHERE rn = nc),
itp AS (
  SELECT lo.grp, q.q,
         lo.m2 + (hi.m2 - lo.m2) / (hi.cmid - lo.cmid)
           * (q.q * lo.total - lo.cmid) AS v
  FROM final lo
  JOIN final hi ON hi.grp = lo.grp AND hi.rn = lo.rn + 1
  CROSS JOIN qv q
  WHERE lo.cmid <= q.q * lo.total AND hi.cmid > q.q * lo.total
),
est AS (
  SELECT b.grp, q.q,
         CASE WHEN b.mn >= q.q * b.total THEN f.m_first
              WHEN b.mx <= q.q * b.total THEN l.m_last
              ELSE i.v END AS v
  FROM bnd b CROSS JOIN qv q
  JOIN firsts f ON f.grp = b.grp
  JOIN lasts l ON l.grp = b.grp
  LEFT JOIN itp i ON i.grp = b.grp AND i.q = q.q
),
ep AS (SELECT grp, {pivot_p} FROM est GROUP BY 1),
ex AS (SELECT {grp} AS grp, {exact} FROM {table} GROUP BY 1)
SELECT ep.grp AS {grp}, {out_cols}
FROM ep JOIN ex USING (grp)
"""


def tdigest_replay_sql(
    table: str = "events",
    col: str = "value",
    key_col: str = "event_id",
    qs: tuple[float, ...] = (0.1, 0.5, 0.9),
    delta: int = 100,
    n_buckets: int = 8,
) -> str:
    """Bit-exact replay of stages/sketches.py binned_tdigest_quantiles:
    per-(key % n_buckets) bucket, rank -> k1 bin -> per-bin ordered-sum
    mean; then the fixed-order (m, bkt, bin) merge with cumulative-weight
    re-binning and linear interpolation at q * total. Ordered list_sum
    matches np.add.reduceat's sequential fold; all weights are integral
    so every cumulative sum is exact; asin/pi()/floor evaluate
    identically to numpy's arcsin/np.pi/floor."""
    qlist = ", ".join(repr(q) for q in qs)

    def k1_bin(q_expr: str) -> str:
        return (
            f"CAST(floor({delta} * (asin(2 * ({q_expr}) - 1) / pi() + 0.5))"
            " AS BIGINT)"
        )

    return f"""
WITH ranked AS (
  SELECT {key_col} % {n_buckets} AS bkt, {col} AS value,
         row_number() OVER (PARTITION BY {key_col} % {n_buckets}
                            ORDER BY {col}) AS r,
         count(*) OVER (PARTITION BY {key_col} % {n_buckets}) AS n
  FROM {table}
),
cent AS (
  SELECT bkt,
         {k1_bin("(r - 0.5) / n")} AS bin,
         list_sum(list(value ORDER BY value)) / count(*) AS m,
         CAST(count(*) AS DOUBLE) AS w
  FROM ranked GROUP BY 1, 2
),
run AS (
  SELECT m, w, bkt, bin,
         sum(w) OVER (ORDER BY m, bkt, bin ROWS UNBOUNDED PRECEDING) AS cum,
         sum(w) OVER () AS total
  FROM cent
),
cent2 AS (
  SELECT {k1_bin("(cum - w / 2) / total")} AS bin2,
         list_sum(list(m * w ORDER BY m, bkt, bin)) / sum(w) AS m2,
         sum(w) AS w2,
         any_value(total) AS total
  FROM run GROUP BY 1
),
final AS (
  SELECT m2, w2, total,
         sum(w2) OVER (ORDER BY bin2 ROWS UNBOUNDED PRECEDING) - w2 / 2 AS cmid,
         row_number() OVER (ORDER BY bin2) AS rn,
         count(*) OVER () AS nc
  FROM cent2
),
quants AS (SELECT unnest([{qlist}]) AS q),
est AS (
  SELECT q,
    (CASE
       WHEN (SELECT min(cmid) FROM final) >= q * (SELECT any_value(total) FROM final)
         THEN (SELECT m2 FROM final WHERE rn = 1)
       WHEN (SELECT max(cmid) FROM final) <= q * (SELECT any_value(total) FROM final)
         THEN (SELECT m2 FROM final WHERE rn = nc)
       ELSE (
         SELECT lo.m2 + (hi.m2 - lo.m2) / (hi.cmid - lo.cmid) * (q * lo.total - lo.cmid)
         FROM final lo JOIN final hi ON hi.rn = lo.rn + 1
         WHERE lo.cmid <= q * lo.total AND hi.cmid > q * lo.total
         LIMIT 1
       )
     END) AS e
  FROM quants
)
SELECT est.q,
       round_even(e, 4) AS estimate,
       round_even(x, 4) AS exact,
       round_even(abs(e - x) / greatest(1e-9, abs(x)), 6) AS rel_err
FROM est
JOIN (SELECT unnest([{qlist}]) AS q,
             unnest(quantile_cont({col}, [{qlist}])) AS x
      FROM {table}) ex ON ex.q = est.q
ORDER BY est.q
"""
