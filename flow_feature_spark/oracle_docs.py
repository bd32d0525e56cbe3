"""DuckDB oracle SQL for the documents/embeddings training-data operators.

Each builder mirrors the corresponding flow_feature_spark.ops module formula
token-for-token (same md5-derived hashes, same r6 rounding, same thresholds),
so the DataFrame implementations can be checked for exact equality. Dialect
tokens cover the engine differences (regexp_replace 'g' flag, hex->int64
parse, list vs array lambdas).
"""

from __future__ import annotations

from flow_feature_spark.ops.dedup import (
    MAX_SHINGLE_DOC_FREQ,
    N_BANDS,
    N_MINHASH,
    SHINGLE_K,
    SIMHASH_BANDS,
)
from flow_feature_spark.ops.similarity import N_HYPERPLANES, _hyperplane
from flow_feature_spark.ops.text import (
    BPE_TOKEN_RE,
    LANG_MARKERS,
    ROLL_BASE,
    ROLL_MOD,
    STOPWORDS,
)
from flow_feature_spark.oracle_queries import r6


def _md5int(dialect: str, x: str) -> str:
    if dialect == "spark":
        return f"cast(conv(substring(md5({x}),1,15),16,10) as bigint)"
    return f"CAST(('0x' || substr(md5({x}),1,15)) AS BIGINT)"


def _split(dialect: str, t: str, pattern: str) -> str:
    if dialect == "spark":
        return f"split({t}, '{pattern}')"
    return f"regexp_split_to_array({t}, '{pattern}')"


def _re_replace_all(dialect: str, t: str, pattern: str, rep: str) -> str:
    if dialect == "spark":
        return f"regexp_replace({t}, '{pattern}', '{rep}')"
    return f"regexp_replace({t}, '{pattern}', '{rep}', 'g')"


def _norm(dialect: str, t: str = "text") -> str:
    lowered = f"lower(coalesce({t}, ''))"
    ws = r"\s+"
    collapsed = _re_replace_all(dialect, lowered, ws, " ")
    return f"trim({collapsed})"


def _arr_len(dialect: str, arr: str) -> str:
    return f"size({arr})" if dialect == "spark" else f"len({arr})"


def _ws_tokens(dialect: str, t: str = "text") -> str:
    trimmed = f"trim(coalesce({t}, ''))"
    split_len = _arr_len(dialect, _split(dialect, trimmed, r"\s+"))
    return f"(CASE WHEN length({trimmed}) = 0 THEN 0 ELSE {split_len} END)"


def _hits(dialect: str, padded: str, word: str) -> str:
    pattern = r"\s" + word + r"\s"
    return f"({_arr_len(dialect, _split(dialect, padded, pattern))} - 1)"


def text_analysis_sql(dialect: str) -> str:
    d = dialect
    norm = _norm(d)
    padded = f"concat(' ', {norm}, ' ')"
    nchars = "length(coalesce(text, ''))"
    n_ws = _ws_tokens(d)
    if d == "spark":
        n_bpe = f"size(regexp_extract_all(coalesce(text,''), '{BPE_TOKEN_RE}', 0))"
    else:
        n_bpe = f"len(regexp_extract_all(coalesce(text,''), '{BPE_TOKEN_RE}'))"
    coal = "coalesce(text,'')"
    stripped = _re_replace_all(d, coal, r"[^\w\s]", "")
    n_punct = f"(length({coal}) - length({stripped}))"
    punct_ratio = r6(f"cast({n_punct} AS double)/greatest(length({coal}), 1)")
    stop_hits = " + ".join(_hits(d, padded, w) for w in STOPWORDS)
    stop_ratio = r6(f"cast({stop_hits} AS double)/greatest({n_ws}, 1)")
    cjk = f"length({_re_replace_all(d, coal, '[^一-鿿]', '')})"
    marker = {
        k: (" + ".join(_hits(d, padded, w) for w in v) if v else "0")
        for k, v in LANG_MARKERS.items()
    }
    lang_pred = f"""CASE
      WHEN {cjk} > 0 THEN 'zh'
      WHEN ({marker['es']}) > ({marker['en']}) AND ({marker['es']}) >= ({marker['fr']})
           AND ({marker['es']}) >= ({marker['de']}) THEN 'es'
      WHEN ({marker['fr']}) > ({marker['en']}) AND ({marker['fr']}) >= ({marker['de']}) THEN 'fr'
      WHEN ({marker['de']}) > ({marker['en']}) THEN 'de'
      WHEN ({marker['en']}) > 0 THEN 'en'
      ELSE 'unknown' END"""
    quality = r6(
        f"(CASE WHEN {n_ws} >= 5 AND {n_ws} <= 5000 THEN 0.4 ELSE 0.0 END"
        f" + CASE WHEN {punct_ratio} < 0.2 AND {n_ws} > 0 THEN 0.3 ELSE 0.0 END"
        f" + CASE WHEN {stop_ratio} > 0.05 THEN 0.3 ELSE 0.0 END)"
    )
    # rolling polynomial fingerprint over the token stream (order-sensitive);
    # both engines fold left-to-right seeded with the first mapped token
    tok_mod = f"({_md5int(d, 'w')} % {ROLL_MOD})"
    if d == "spark":
        words = _split(d, norm, " ")
        mapped = f"transform({words}, w -> {tok_mod})"
        fp_roll = (
            f"aggregate(slice({mapped}, 2, greatest(size({mapped}) - 1, 0)),"
            f" element_at({mapped}, 1),"
            f" (acc, x) -> (acc * {ROLL_BASE} + x) % {ROLL_MOD})"
        )
    else:
        words = _split(d, norm, " ")
        mapped = f"list_transform({words}, w -> {tok_mod})"
        fp_roll = f"list_reduce({mapped}, (acc, x) -> (acc * {ROLL_BASE} + x) % {ROLL_MOD})"
    return f"""
SELECT doc_id,
       cast({n_ws} AS bigint)    AS n_ws_tokens,
       cast({n_bpe} AS bigint)   AS n_bpe_tokens,
       cast({nchars} AS bigint)  AS n_chars_actual,
       {punct_ratio}             AS punct_ratio,
       {stop_ratio}              AS stopword_ratio,
       {quality}                 AS quality,
       {lang_pred}               AS lang_pred,
       md5({norm})               AS fp_md5,
       cast({fp_roll} AS bigint) AS fp_roll
FROM documents
"""


def dedup_exact_sql(dialect: str, synth_dups: bool = False) -> str:
    """``synth_dups`` unions a deterministic duplicated slice (doc_id % 10
    = 0 re-emitted at doc_id + 1000000) so the query has non-trivial
    duplicate groups even on corpora with no byte-identical docs — the
    testdata has none at sf0.01, which left the driver row 0-row."""
    norm = _norm(dialect)
    src = "documents"
    if synth_dups:
        src = (
            "(SELECT doc_id, text FROM documents UNION ALL "
            "SELECT doc_id + 1000000 AS doc_id, text FROM documents "
            "WHERE doc_id % 10 = 0)"
        )
    return f"""
SELECT fp, cast(count(*) AS bigint) AS group_size,
       min(doc_id) AS keeper_doc_id
FROM (SELECT doc_id, md5({norm}) AS fp FROM {src} docs) t
GROUP BY fp HAVING count(*) >= 2
"""


def _shingles_cte(dialect: str, k: int = SHINGLE_K) -> str:
    d = dialect
    norm = _norm(d)
    words = _split(d, norm, " ")
    if d == "spark":
        sh = (
            f"array_distinct(transform(sequence(1, greatest({_arr_len(d, words)} - {k-1}, 0)),"
            f" i -> concat_ws(' ', slice({words}, i, {k}))))"
        )
        explode = f"explode({sh})"
        return f"""
doc_sh AS (
  SELECT doc_id, shingle
  FROM (SELECT doc_id, {explode} AS shingle FROM documents) t
  WHERE length(shingle) > 0
)"""
    sh = (
        f"list_distinct(list_transform(range(1, greatest({_arr_len(d, words)} - {k-1}, 0) + 1),"
        f" i -> array_to_string(({words})[i:i+{k-1}], ' ')))"
    )
    return f"""
doc_sh AS (
  SELECT doc_id, unnest({sh}) AS shingle FROM documents
  -- empty shingles filtered below to mirror the Spark build
),
doc_sh_f AS (SELECT * FROM doc_sh WHERE length(shingle) > 0)"""


def ngram_jaccard_sql(
    dialect: str,
    threshold: float = 0.5,
    max_doc_freq: int = MAX_SHINGLE_DOC_FREQ,
) -> str:
    d = dialect
    src = "doc_sh" if d == "spark" else "doc_sh_f"
    return f"""
WITH {_shingles_cte(d)},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM {src} GROUP BY doc_id),
-- hot-shingle DF cap mirrors ops.dedup.ngram_jaccard_pairs: viral shingles
-- are excluded from candidate generation, not from per-doc sizes
hot AS (SELECT shingle FROM {src} GROUP BY shingle HAVING count(*) > {max_doc_freq}),
sh_join AS (SELECT * FROM {src} WHERE shingle NOT IN (SELECT shingle FROM hot)),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, cast(count(*) AS bigint) AS inter
  FROM sh_join a JOIN sh_join b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, inter,
       cast(sa.n_sh AS bigint) AS n_a, cast(sb.n_sh AS bigint) AS n_b,
       {r6('inter / (sa.n_sh + sb.n_sh - inter)')} AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE {r6('inter / (sa.n_sh + sb.n_sh - inter)')} >= {threshold}
"""


def _seeds_src(dialect: str, k: int) -> str:
    if dialect == "spark":
        return f"(SELECT explode(sequence(0, {k-1})) AS seed)"
    return f"(SELECT unnest(range({k})) AS seed)"


def minhash_sql(dialect: str, k: int = N_MINHASH) -> str:
    d = dialect
    src = "doc_sh" if d == "spark" else "doc_sh_f"
    h = _md5int(d, "concat(shingle, '#', cast(seed AS string))")
    cols = ",\n  ".join(
        f"min(CASE WHEN seed = {i} THEN h END) AS mh{i}" for i in range(k)
    )
    return f"""
WITH {_shingles_cte(d)},
hashed AS (
  SELECT doc_id, seed, {h} AS h
  FROM {src} CROSS JOIN {_seeds_src(d, k)} s
)
SELECT doc_id, {cols}
FROM hashed GROUP BY doc_id
"""


def minhash_lsh_pairs_sql(
    dialect: str, k: int = N_MINHASH, bands: int = N_BANDS
) -> str:
    d = dialect
    rows = k // bands
    band_rows = []
    for b in range(bands):
        parts = ", ".join(
            f"cast(mh{b * rows + r} AS string)" for r in range(rows)
        )
        band_rows.append(
            f"SELECT doc_id, {b} AS band_id, md5(concat_ws('_', {parts})) AS bh FROM sig"
        )
    banded = " UNION ALL ".join(band_rows)
    return f"""
WITH sig AS ({minhash_sql(d, k)}),
banded AS ({banded})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band_id = b.band_id AND a.bh = b.bh AND a.doc_id < b.doc_id
"""


def simhash_sql(dialect: str) -> str:
    """64-bit SimHash as four 16-bit bands, mirroring ops.dedup.simhash64_bands:
    bands 0-1 from bits 0..31 of md5(w), bands 2-3 from md5(w || '#hi')."""
    d = dialect
    norm = _norm(d)
    words = _split(d, norm, " ")
    salted = _md5int(d, "concat(w, '#hi')")
    if d == "spark":
        toks = f"array_distinct({words})"
        ha = f"transform({toks}, w -> {_md5int(d, 'w')})"
        hb = f"transform({toks}, w -> {salted})"

        def bitsum(arr: str, shift: int, i: int) -> str:
            return (
                f"aggregate({arr}, 0, (acc, h) -> acc + "
                f"(CASE WHEN (shiftright(h, {shift + i}) & 1) = 1 THEN 1 ELSE -1 END))"
            )
    else:
        toks = f"list_distinct({words})"
        ha = f"list_transform({toks}, w -> {_md5int(d, 'w')})"
        hb = f"list_transform({toks}, w -> {salted})"

        def bitsum(arr: str, shift: int, i: int) -> str:
            return (
                f"list_sum(list_transform({arr}, h -> "
                f"CASE WHEN ((h >> {shift + i}) & 1) = 1 THEN 1 ELSE -1 END))"
            )

    def band(arr: str, shift: int) -> str:
        return "cast(" + " + ".join(
            f"(CASE WHEN ({bitsum(arr, shift, i)}) > 0 THEN {1 << i} ELSE 0 END)"
            for i in range(16)
        ) + " AS bigint)"

    return f"""
WITH tok AS (SELECT doc_id, {ha} AS ha, {hb} AS hb FROM documents)
SELECT doc_id,
       {band('ha', 0)}  AS h0,
       {band('ha', 16)} AS h1,
       {band('hb', 0)}  AS h2,
       {band('hb', 16)} AS h3
FROM tok
"""


def simhash_pairs_sql(dialect: str, max_hamming: int = 3) -> str:
    """4x16-bit band equi-join candidates + exact 64-bit hamming filter."""
    d = dialect
    bands = [f"h{k}" for k in range(SIMHASH_BANDS)]
    xor = (
        (lambda c: f"(a{c} ^ b{c})") if d == "spark" else (lambda c: f"xor(a{c}, b{c})")
    )
    branch = " UNION ".join(
        f"""
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         {', '.join(f'a.{c} AS a{c}, b.{c} AS b{c}' for c in bands)}
  FROM keyed a JOIN keyed b ON a.{c0} = b.{c0} AND a.doc_id < b.doc_id"""
        for c0 in bands
    )
    ham = " + ".join(f"bit_count({xor(c)})" for c in bands)
    return f"""
WITH keyed AS ({simhash_sql(d)}),
pairs AS ({branch})
SELECT doc_a, doc_b, cast({ham} AS int) AS hamming
FROM pairs
WHERE ({ham}) <= {max_hamming}
"""


# ---------------------------------------------------------------------------
# Embedding similarity.
# ---------------------------------------------------------------------------

def _dot_sql(dialect: str, a: str, b: str, dim: int) -> str:
    if dialect == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x AS double) * cast(y AS double)),"
            f" cast(0.0 AS double), (acc, v) -> acc + v)"
        )
    return (
        f"list_sum(list_transform(range(1, {dim + 1}),"
        f" i -> CAST(({a})[i] AS DOUBLE) * CAST(({b})[i] AS DOUBLE)))"
    )


def _norm2_sql(dialect: str, a: str, dim: int) -> str:
    return _dot_sql(dialect, a, a, dim)


def cosine_topk_sql(dialect: str, dim: int = 64, n_queries: int = 8, k: int = 5) -> str:
    d = dialect
    dot = _dot_sql(d, "q.qv", "c.cv", dim)
    n1 = _norm2_sql(d, "q.qv", dim)
    n2 = _norm2_sql(d, "c.cv", dim)
    cos = r6(f"({dot}) / (sqrt({n1}) * sqrt({n2}))")
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {n_queries}),
c AS (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT q.query_id, c.cand_id, {cos} AS cos_sim
  FROM c CROSS JOIN q WHERE c.cand_id <> q.query_id
)
SELECT query_id, cand_id, cos_sim,
       cast(rn AS int) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, cand_id) AS rn
      FROM scored) t
WHERE rn <= {k}
"""


def _bucket_sql(
    dialect: str,
    vec: str,
    dim: int,
    n_planes: int = N_HYPERPLANES,
    plane_offset: int = 0,
) -> str:
    terms = []
    for p in range(n_planes):
        if dialect == "spark":
            hp = "array(" + ", ".join(
                repr(v) + "D" for v in _hyperplane(dim, plane_offset + p)
            ) + ")"
        else:
            hp = "[" + ", ".join(repr(v) for v in _hyperplane(dim, plane_offset + p)) + "]"
        dot = _dot_sql(dialect, vec, hp, dim)
        terms.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << p} ELSE 0 END)")
    return "cast(" + " + ".join(terms) + " AS int)"


def _multi_table_keyed_cte(
    dialect: str, dim: int, n_tables: int, planes_per_table: int
) -> str:
    """(vid, table_id, key) rows — one per vector per LSH table, mirroring
    ops.similarity.lsh_bucket_keys (plane_offset = table_id * planes_per_table)."""
    branches = []
    for t in range(n_tables):
        bucket = _bucket_sql(
            dialect, "embedding", dim, planes_per_table, plane_offset=t * planes_per_table
        )
        branches.append(
            f"SELECT vec_id AS vid, {t} AS table_id, {bucket} AS key FROM embeddings"
        )
    return "keyed AS (" + " UNION ALL ".join(branches) + ")"


def _multiprobe_probes_cte(
    dialect: str, dim: int, n_tables: int, planes_per_table: int, flips: int
) -> str:
    """``probes`` CTE: (vid, table_id, key) with the home key PLUS the keys
    reached by flipping each of the ``flips`` smallest-|dot|-margin sign
    bits — mirrors ops.similarity.lsh_probes_by_table value-for-value (same
    md5 hyperplanes, same left-assoc dot order, ties on margin broken by
    plane index via the struct sort)."""
    if dialect != "duckdb":
        raise NotImplementedError(
            "multiprobe oracle is duckdb-only (the spark side is the engine)"
        )
    r = planes_per_table
    ctes, branches = [], []
    for t in range(n_tables):
        dots = "[" + ", ".join(
            _dot_sql(
                "duckdb", "embedding",
                "[" + ", ".join(repr(v) for v in _hyperplane(dim, t * r + p)) + "]",
                dim,
            )
            for p in range(r)
        ) + "]"
        key = "cast((" + " + ".join(
            f"(CASE WHEN dots[{p + 1}] >= 0 THEN {1 << p} ELSE 0 END)"
            for p in range(r)
        ) + ") AS int)"
        margins = (
            f"list_transform(range(0, {r}), p -> "
            "{'m': abs(dots[p + 1]), 'p': p})"
        )
        ctes.append(f"dotted{t} AS (SELECT vec_id, {dots} AS dots FROM embeddings)")
        ctes.append(
            f"kt{t} AS (SELECT vec_id, {key} AS key, {margins} AS margins "
            f"FROM dotted{t})"
        )
        branches.append(
            f"SELECT vec_id AS vid, {t} AS table_id, "
            "unnest(list_distinct(list_append(list_transform("
            f"list_slice(list_sort(margins), 1, {flips}), "
            "s -> cast(xor(key, 1 << s.p) AS int)), key))) AS key "
            f"FROM kt{t}"
        )
    probes = "probes AS (" + " UNION ALL ".join(branches) + ")"
    return ", ".join(ctes + [probes])


def embedding_near_dup_sql(
    dialect: str,
    dim: int = 64,
    threshold: float = 0.9,
    n_tables: int = 4,
    planes_per_table: int = 16,
    max_bucket_size: int = 10_000,
    multiprobe_flips: int = 0,
) -> str:
    """Multi-table LSH near-dup mirror (bucket-size cap + table union +
    exact cosine re-filter), token-for-token with
    ops.similarity.embedding_near_dup_pairs. ``multiprobe_flips`` mirrors
    the engine's probe-expanded candidate join (probe side vs home side,
    least/greatest canonicalization)."""
    d = dialect
    dot = _dot_sql(d, "e1.embedding", "e2.embedding", dim)
    n1 = _norm2_sql(d, "e1.embedding", dim)
    n2 = _norm2_sql(d, "e2.embedding", dim)
    cos = r6(f"({dot}) / (sqrt({n1}) * sqrt({n2}))")
    if multiprobe_flips:
        probes_cte = _multiprobe_probes_cte(
            d, dim, n_tables, planes_per_table, multiprobe_flips
        )
        cand = """
cand AS (
  SELECT DISTINCT least(a.vid, b.vid) AS vec_a, greatest(a.vid, b.vid) AS vec_b
  FROM probes a JOIN capped b
    ON a.table_id = b.table_id AND a.key = b.key AND a.vid <> b.vid
)"""
        extra = f",\n{probes_cte}"
    else:
        cand = """
cand AS (
  SELECT DISTINCT a.vid AS vec_a, b.vid AS vec_b
  FROM capped a JOIN capped b
    ON a.table_id = b.table_id AND a.key = b.key AND a.vid < b.vid
)"""
        extra = ""
    return f"""
WITH {_multi_table_keyed_cte(d, dim, n_tables, planes_per_table)},
big AS (
  SELECT table_id, key FROM keyed GROUP BY table_id, key
  HAVING count(*) > {max_bucket_size}
),
capped AS (
  SELECT k.* FROM keyed k LEFT JOIN big
    ON k.table_id = big.table_id AND k.key = big.key
  WHERE big.key IS NULL
){extra},
{cand}
SELECT vec_a, vec_b, {cos} AS cos_sim
FROM cand
JOIN embeddings e1 ON e1.vec_id = vec_a
JOIN embeddings e2 ON e2.vec_id = vec_b
WHERE {cos} >= {threshold}
"""


def ann_lsh_topk_sql(
    dialect: str,
    dim: int = 64,
    n_queries: int = 8,
    k: int = 5,
    n_tables: int = 4,
    planes_per_table: int = 4,
) -> str:
    """Mirror of ops.similarity.lsh_bucket_topk: candidates share any LSH
    table bucket with a query (hyperplanes are deterministic md5, so the
    bucket keys are engine-independent), exact cosine re-rank, top-k."""
    d = dialect
    dot = _dot_sql(d, "e1.embedding", "e2.embedding", dim)
    n1 = _norm2_sql(d, "e1.embedding", dim)
    n2 = _norm2_sql(d, "e2.embedding", dim)
    cos = r6(f"({dot}) / (sqrt({n1}) * sqrt({n2}))")
    return f"""
WITH {_multi_table_keyed_cte(d, dim, n_tables, planes_per_table)},
q AS (SELECT vid AS query_id, table_id, key FROM keyed WHERE vid < {n_queries}),
cand AS (
  SELECT DISTINCT q.query_id, c.vid AS cand_id
  FROM keyed c JOIN q ON c.table_id = q.table_id AND c.key = q.key
  WHERE c.vid <> q.query_id
),
scored AS (
  SELECT query_id, cand_id, {cos} AS cos_sim
  FROM cand
  JOIN embeddings e1 ON e1.vec_id = query_id
  JOIN embeddings e2 ON e2.vec_id = cand_id
)
SELECT query_id, cand_id, cos_sim, cast(rn AS int) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, cand_id) AS rn
      FROM scored) t
WHERE rn <= {k}
"""


def ivf_topk_sql(
    dialect: str,
    dim: int = 64,
    n_queries: int = 8,
    k: int = 5,
    n_anchors: int = 16,
    nprobe: int = 4,
) -> str:
    """Mirror of ops.similarity.ivf_topk: unit-norm md5 anchors, first-max
    cell assignment (list_position/array_position are both 1-based and
    first-occurrence), per-query top-nprobe cell probes, exact cosine
    re-rank."""
    from flow_feature_spark.ops.similarity import _ivf_anchor

    d = dialect
    anchors = [_ivf_anchor(dim, a) for a in range(n_anchors)]

    def lit_vec(vals: list[float]) -> str:
        if d == "spark":
            return "array(" + ", ".join(repr(v) + "D" for v in vals) + ")"
        return "[" + ", ".join(repr(v) for v in vals) + "]"

    dots = [
        _dot_sql(d, "embedding", lit_vec(anc), dim) for anc in anchors
    ]
    dots_arr = ("array(" if d == "spark" else "[") + ", ".join(dots) + (
        ")" if d == "spark" else "]"
    )
    if d == "spark":
        cell = "cast(array_position(_dots, array_max(_dots)) AS int)"
    else:
        cell = "cast(list_position(_dots, list_max(_dots)) AS int)"
    anchor_rows = " UNION ALL ".join(
        f"SELECT {a + 1} AS cell, {lit_vec(anc)} AS av"
        for a, anc in enumerate(anchors)
    )
    qdot = _dot_sql(d, "q.qv", "a.av", dim)
    rdot = _dot_sql(d, "e1.embedding", "e2.embedding", dim)
    n1 = _norm2_sql(d, "e1.embedding", dim)
    n2 = _norm2_sql(d, "e2.embedding", dim)
    cos = r6(f"({rdot}) / (sqrt({n1}) * sqrt({n2}))")
    return f"""
WITH based AS (SELECT vec_id AS vid, embedding, {dots_arr} AS _dots FROM embeddings),
keyed AS (SELECT vid, {cell} AS cell FROM based),
anchors AS ({anchor_rows}),
q AS (SELECT vec_id AS vid, embedding AS qv FROM embeddings WHERE vec_id < {n_queries}),
probes AS (
  SELECT vid AS query_id, cell
  FROM (SELECT q.vid, a.cell,
               row_number() OVER (PARTITION BY q.vid
                                  ORDER BY ({qdot}) DESC, a.cell) AS rn
        FROM q CROSS JOIN anchors a) t
  WHERE rn <= {nprobe}
),
cand AS (
  SELECT p.query_id, c.vid AS cand_id
  FROM keyed c JOIN probes p ON c.cell = p.cell
  WHERE c.vid <> p.query_id
),
scored AS (
  SELECT query_id, cand_id, {cos} AS cos_sim
  FROM cand
  JOIN embeddings e1 ON e1.vec_id = query_id
  JOIN embeddings e2 ON e2.vec_id = cand_id
)
SELECT query_id, cand_id, cos_sim, cast(rn AS int) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, cand_id) AS rn
      FROM scored) t
WHERE rn <= {k}
"""


def frame_sample_sql(dialect: str, every_n: int = 2) -> str:
    """Mirror of ops.multimodal.sample_frames byte arithmetic (DuckDB only —
    the Spark side is the mapInPandas op itself). Emits typed ints, not raw
    frame bytes, so the driver's value hash is representation-stable."""
    return f"""
WITH m AS (
  SELECT doc_id, encode(coalesce(text, '')) AS p,
         octet_length(encode(coalesce(text, ''))) AS n
  FROM documents
  WHERE octet_length(encode(coalesce(text, ''))) > 0
),
f AS (
  SELECT doc_id, p, n, (1 + n % 16) AS nf,
         ((n + (1 + n % 16) - 1) // (1 + n % 16)) AS fs
  FROM m
),
fr AS (
  -- DuckDB substring() has no BLOB overload: slice the hex encoding instead
  -- (2 hex chars per byte)
  SELECT doc_id, unnest(range(0, nf)) AS i, hex(p) AS hx, fs FROM f
),
sliced AS (
  SELECT doc_id, i, substr(hx, cast(i*fs*2 + 1 AS bigint), cast(fs*2 AS bigint)) AS fh
  FROM fr WHERE i % {every_n} = 0
)
SELECT doc_id,
       cast(i AS int)                 AS frame_idx,
       cast(length(fh) // 2 AS bigint) AS frame_len,
       cast(CASE WHEN length(fh) = 0 THEN -1
                 ELSE CAST(('0x' || substr(fh, 1, 2)) AS INT)
            END AS int)               AS frame_head
FROM sliced
"""


def multimodal_decode_sql(dialect: str) -> str:
    """Oracle for the mapInPandas decode stub (documents are ASCII, so
    first-UTF-8-byte == codepoint of the first char)."""
    blen = (
        "octet_length(encode(coalesce(text,''), 'utf-8'))"
        if dialect == "spark"
        else "octet_length(encode(coalesce(text,'')))"
    )
    first = "ascii(substring(coalesce(text,''), 1, 1))"
    return f"""
SELECT doc_id,
  cast({blen} AS bigint) AS byte_len,
  cast(CASE WHEN {blen} = 0 THEN -1 ELSE {first} END AS int) AS header_byte,
  cast(CASE WHEN {blen} = 0 THEN 0 ELSE {blen} % 640 END AS int) AS fake_width,
  cast(CASE WHEN {blen} = 0 THEN 0 ELSE {blen} % 480 END AS int) AS fake_height,
  cast(CASE WHEN {blen} = 0 THEN 0 ELSE 1 + ({blen} % 16) END AS int) AS n_frames
FROM documents
"""


def stratified_sample_sql(dialect: str, k: int = 10, salt: str = "") -> str:
    """ops/sample.stratified_topk oracle: deterministic per-stratum top-k by
    md5 order (same 60-bit md5-int primitive as the dedup signatures)."""
    if dialect == "spark":
        key = f"concat('{salt}', cast(doc_id AS string))"
    else:
        key = f"('{salt}' || CAST(doc_id AS VARCHAR))"
    h = _md5int(dialect, key)
    return f"""
SELECT doc_id, source, lang, n_chars, sample_rank
FROM (
  SELECT doc_id, source, lang, n_chars,
         cast(row_number() OVER (PARTITION BY source
                                 ORDER BY {h}, doc_id) AS int) AS sample_rank
  FROM documents
) t WHERE sample_rank <= {k}
"""


def token_vocab_sql(dialect: str, top_n: int = 50) -> str:
    """ops/text.token_vocabulary oracle: corpus token frequency, top-N with
    deterministic (count desc, token asc) cut."""
    norm = _norm(dialect)
    if dialect == "spark":
        tok = f"explode(split({norm}, ' '))"
    else:
        tok = f"unnest(regexp_split_to_array({norm}, ' '))"
    return f"""
SELECT token, n, rank
FROM (
  SELECT token, cast(count(*) AS bigint) AS n,
         cast(row_number() OVER (ORDER BY count(*) DESC, token) AS int) AS rank
  FROM (SELECT {tok} AS token FROM documents) t
  WHERE token <> ''
  GROUP BY token
) r WHERE rank <= {top_n}
"""


def tfidf_sql(dialect: str, k: int = 5) -> str:
    """ops/text.tfidf_topk oracle: per-doc top-k terms by the RATIONAL
    tf-idf score r6((tf·N)/df) — the same pinned double-op order as the
    engine, so scores are bit-identical (the ln-idf variant is engine-only;
    transcendentals are not cross-engine bit-stable)."""
    norm = _norm(dialect)
    if dialect == "spark":
        tok = f"explode(split({norm}, ' '))"
    else:
        tok = f"unnest(regexp_split_to_array({norm}, ' '))"
    r6 = ("floor(cast(tf AS double) * cast(n_docs AS double) "
          "/ cast(df AS double) * 1e6 + 0.5) / 1e6")
    return f"""
WITH tf AS (
  SELECT doc_id, token, cast(count(*) AS bigint) AS tf
  FROM (SELECT doc_id, {tok} AS token FROM documents) t
  WHERE token <> ''
  GROUP BY doc_id, token
),
dfreq AS (
  SELECT token, cast(count(*) AS bigint) AS df FROM tf GROUP BY token
),
nd AS (SELECT cast(count(DISTINCT doc_id) AS bigint) AS n_docs FROM documents)
SELECT doc_id, token, tf, df, score, rank
FROM (
  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
         ({r6}) AS score,
         cast(row_number() OVER (PARTITION BY tf.doc_id
              ORDER BY ({r6}) DESC, tf.token) AS int) AS rank
  FROM tf JOIN dfreq ON tf.token = dfreq.token CROSS JOIN nd
) s WHERE rank <= {k}
"""


def kmeans_sql(dialect: str, k: int = 8, iters: int = 3, dim: int = 64) -> str:
    """ops/kmeans.kmeans_fit oracle: ``iters`` Lloyd iterations unrolled as
    CTE blocks, every quantity in the engine's exact domains — int64
    quantized vectors (floor(x·2^20+0.5)), integer squared distances with
    smallest-index tie-break, centroid update floor((2.0·s+n)/(2.0·n)) in
    the same pinned double-op order. An ITERATIVE algorithm the hash gate
    can grade exactly; early-stop can only make the engine match (a
    no-move iteration is a fixed point, so replaying it is identity)."""
    assert dialect == "duckdb", "oracle-only SQL; the engine side is the API"
    scale = float(1 << 20)
    dist = (
        "list_sum(list_transform(range(1, {d} + 1),"
        " i -> (p.q[i] - c.q[i]) * (p.q[i] - c.q[i])))"
    ).format(d=dim)
    blocks = [
        f"""pts AS (
  SELECT vec_id AS id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS double) * {scale} + 0.5) AS bigint)) AS q
  FROM embeddings
),
seeded AS (
  SELECT q, row_number() OVER (ORDER BY md5(CAST(id AS varchar)), id) AS rn
  FROM pts
),
cent0 AS (SELECT CAST(rn - 1 AS int) AS c, q FROM seeded WHERE rn <= {k})"""
    ]
    for t in range(1, iters + 1):
        prev = f"cent{t - 1}"
        blocks.append(f"""assign{t} AS (
  SELECT id, q, c FROM (
    SELECT p.id, p.q, c.c,
           row_number() OVER (PARTITION BY p.id
                              ORDER BY {dist}, c.c) AS rk
    FROM pts p CROSS JOIN {prev} c
  ) a WHERE rk = 1
),
upd{t} AS (
  SELECT a.c, CAST(r.range AS int) AS pos,
         CAST(floor((2.0 * sum(a.q[r.range + 1]) + count(*))
                    / (2.0 * count(*))) AS bigint) AS cq
  FROM assign{t} a CROSS JOIN range(0, {dim}) r
  GROUP BY a.c, r.range
),
cent{t} AS (
  SELECT p.c, coalesce(u.q, p.q) AS q
  FROM {prev} p LEFT JOIN (
    SELECT c, list(cq ORDER BY pos) AS q FROM upd{t} GROUP BY c
  ) u ON p.c = u.c
)""")
    return f"""
WITH {', '.join(blocks)}
SELECT c AS cluster, CAST(r.range AS int) AS pos, q[r.range + 1] AS cq
FROM cent{iters} CROSS JOIN range(0, {dim}) r
"""


def dedup_clusters_sql(dialect: str) -> str:
    """ops/cluster.dedup_clusters oracle: connected components of the
    simhash near-dup pair graph via recursive transitive closure — min
    reachable doc_id = component id. A genuinely independent implementation
    from the engine's iterative label propagation (closure is quadratic in
    component size, fine at oracle scale; the engine side is the one that
    scales)."""
    assert dialect == "duckdb", "spark side runs the engine API (dedup_clusters)"
    inner = simhash_pairs_sql(dialect)
    return f"""
WITH RECURSIVE pairs AS ({inner}),
sym AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
nodes AS (SELECT DISTINCT a AS node FROM sym),
reach AS (
  SELECT node, node AS lab FROM nodes
  UNION
  SELECT r.node, s.b AS lab FROM reach r JOIN sym s ON r.lab = s.a
)
SELECT node AS doc_id, cast(min(lab) AS bigint) AS component,
       (node = min(lab)) AS is_canonical
FROM reach GROUP BY node
"""


FUZZY_PREFIX_LEN = 16
FUZZY_MAX_DIST = 1


def fuzzy_pairs_sql(
    dialect: str,
    prefix_len: int = FUZZY_PREFIX_LEN,
    max_dist: int = FUZZY_MAX_DIST,
) -> str:
    """Brute-force oracle for ops.fuzzy.edit_distance_pairs over document
    title proxies (first ``prefix_len`` chars of non-empty texts): the
    banded engine must equal the all-pairs levenshtein join exactly."""
    return f"""
WITH p AS (
  SELECT doc_id, substring(text, 1, {prefix_len}) AS s
  FROM documents
  WHERE text IS NOT NULL AND length(substring(text, 1, {prefix_len})) > 0
)
SELECT id_a, id_b, cast(dist AS integer) AS dist
FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, levenshtein(a.s, b.s) AS dist
  FROM p a JOIN p b ON a.doc_id < b.doc_id
) d
WHERE dist <= {max_dist}
"""


def turn_repetition_sql(dialect: str) -> str:
    """Turn-to-turn repetition oracle (mirrors ops.text.turn_overlap over
    events: conv = user, turn text = props). Token sets are distinct
    non-empty whitespace pieces of the lowercased trimmed text; overlap and
    union are exact set sizes; Jaccard is one r6 divide. First turns are
    NULL, never zero."""
    return r"""
WITH t AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         coalesce(props, '') AS txt
  FROM events
),
tok AS (
  SELECT *,
         list_distinct(list_filter(
           regexp_split_to_array(trim(lower(txt)), '\s+'),
           x -> x <> '')) AS toks
  FROM t
),
lagd AS (
  SELECT *,
         lag(toks) OVER w AS ptoks,
         lag(txt) OVER w AS ptxt
  FROM tok
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT user_id,
       event_id,
       cast(len(toks) AS bigint) AS n_tokens,
       CASE WHEN ptoks IS NULL THEN NULL
            ELSE cast(len(list_intersect(toks, ptoks)) AS bigint) END AS n_shared,
       CASE WHEN ptoks IS NULL THEN NULL
            ELSE cast(len(list_distinct(toks || ptoks)) AS bigint) END AS n_union,
       CASE WHEN ptoks IS NULL OR len(list_distinct(toks || ptoks)) = 0
            THEN NULL
            ELSE floor((cast(len(list_intersect(toks, ptoks)) AS double)
                        / cast(len(list_distinct(toks || ptoks)) AS double))
                       * 1e6 + 0.5) / 1e6 END AS jaccard_prev,
       CASE WHEN ptxt IS NULL THEN NULL ELSE txt = ptxt END AS is_exact_repeat
FROM lagd
"""
