"""DuckDB oracle SQL for ``__ray_entry__.oracle_sql()``.

Each string is the ANSI-SQL equivalent of the same-named query in
``raycells.pipelines.queries``, runnable by DuckDB with the driver's
pre-registered views (region nation customer supplier part orders
lineitem events documents embeddings) at sf=0.01. The geospatial family
reads the synthesized interleaved-doc table from its deterministic /tmp
path (written idempotently before any query runs).

Column names/aliases match the Ray pipelines verbatim; float aggregates
are ROUND()ed identically on both sides; everything else is integer.
The tile decode is reproducible in SQL because the tile store is pure
int64 LCG arithmetic (raycells/io/tilestore.py docstrings carry the
formulas).
"""

from __future__ import annotations

DOCS_GLOB = "/tmp/raycells_docs/sf0.01/*.parquet"

# shared CTE: explode the interleaved spans with 0-based span index
_EXPLODE = f"""
WITH ex AS (
    SELECT doc_id,
           unnest(spans) AS s,
           CAST(generate_subscripts(spans, 1) - 1 AS BIGINT) AS span_idx
    FROM read_parquet('{DOCS_GLOB}')
)
"""

# media spans with parsed tile seed
_MEDIA = _EXPLODE + """
, media AS (
    SELECT doc_id, span_idx,
           CAST(substr(s.media_ref, 8) AS BIGINT) AS seed
    FROM ex WHERE s.kind = 'media'
)
"""

# band-4 tile decode: the tilestore LCG (tilestore.py synth_band_values)
_BAND_STATS = _MEDIA + """
, cells AS (
    SELECT m.doc_id, m.span_idx, m.seed, r.range AS i
    FROM media m, range(4096) r
),
vals AS (
    SELECT doc_id, span_idx, seed,
           CASE WHEN (seed + i * 7) % 33 = 0 THEN 0
                ELSE 1 + (seed * 2654435761 + (i + 404) * 40503) % 65520
           END AS v
    FROM cells
),
tile_stats AS (
    SELECT doc_id, span_idx, seed,
           CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS valid_count,
           CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nodata_count,
           MIN(v) FILTER (WHERE v > 0) AS min_val,
           MAX(v) AS max_val,
           CAST(SUM(v) AS BIGINT) AS sum_val
    FROM vals GROUP BY doc_id, span_idx, seed
)
"""

# tile centroid + grid cell from the seed (tilestore.centroids / cellid.grid_cell)
_GRID = """
, geo AS (
    SELECT t.*,
           CASE WHEN seed % 10 < 6 THEN
                (CASE seed % 3 WHEN 0 THEN -74.0 WHEN 1 THEN 2.35 ELSE 139.7 END)
                + ((seed * 31) % 2000 - 1000) / 1000.0
           ELSE ((seed * 9973) % 360000) / 1000.0 - 180.0 END AS lon,
           CASE WHEN seed % 10 < 6 THEN
                (CASE seed % 3 WHEN 0 THEN 40.7 WHEN 1 THEN 48.85 ELSE 35.7 END)
                + ((seed * 57) % 2000 - 1000) / 1000.0
           ELSE ((seed * 7919) % 170000) / 1000.0 - 85.0 END AS lat
    FROM tile_stats t
),
gridded AS (
    SELECT *, CAST(floor((lat + 90.0) / 0.25) * 1440 + floor((lon + 180.0) / 0.25) AS BIGINT) AS grid_cell
    FROM geo
)
"""

_LANG_SCORE = """
    len(list_filter(string_split(text, ' '), x -> x = '{w}'))
"""


def _hits(word: str, col: str = "text") -> str:
    return f"len(list_filter(string_split({col}, ' '), x -> x = '{word}'))"


def _score(words) -> str:
    return " + ".join(_hits(w) for w in words)


def build() -> dict:
    from raycells.text.analysis import LANG_MARKERS, STOPWORDS

    stop_expr = " + ".join(_hits(w) for w in STOPWORDS)
    scores = {lang: _score(ws) for lang, ws in LANG_MARKERS.items()}
    langs = list(scores)
    greatest = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    detect_case = "CASE WHEN " + greatest + " = 0 THEN 'und' "
    for l in langs:
        detect_case += f"WHEN s_{l} = {greatest} THEN '{l}' "
    detect_case += "END"

    return {
        "explode_media": _EXPLODE
        + """
            SELECT doc_id, span_idx, s.media_ref AS media_ref
            FROM ex WHERE s.kind = 'media'
        """,
        "span_digest": _EXPLODE
        + """
            SELECT doc_id,
                   md5(string_agg(s.kind || chr(31) || s.text || chr(31) || s.media_ref,
                                  chr(30) ORDER BY span_idx)) AS digest
            FROM ex GROUP BY doc_id
        """,
        "band_tile_stats": _BAND_STATS + _GRID
        + """
            SELECT doc_id, span_idx, seed, valid_count, nodata_count,
                   min_val, max_val, sum_val, grid_cell
            FROM gridded
        """,
        "cell_agg_band": _BAND_STATS + _GRID
        + """
            SELECT grid_cell,
                   CAST(count(*) AS BIGINT) AS n_tiles,
                   CAST(SUM(valid_count) AS BIGINT) AS sum_valid_count,
                   CAST(SUM(nodata_count) AS BIGINT) AS sum_nodata_count,
                   CAST(SUM(sum_val) AS BIGINT) AS sum_sum_val,
                   MIN(min_val) AS min_min_val,
                   MAX(max_val) AS max_max_val
            FROM gridded GROUP BY grid_cell
        """,
        "knn_tiles": _MEDIA + _KNN_TAIL,
        "tile_type_hist": _MEDIA
        + """
            , typed AS (
                SELECT CASE seed % 16 WHEN 0 THEN 'UInt16' WHEN 1 THEN 'Float32' WHEN 2 THEN 'UInt16' WHEN 3 THEN 'Float32' WHEN 4 THEN 'UInt8' WHEN 5 THEN 'UInt16' WHEN 6 THEN 'Float32' WHEN 7 THEN 'Int16' WHEN 8 THEN 'UInt32' WHEN 9 THEN 'Float64' WHEN 10 THEN 'UInt64' WHEN 11 THEN 'Int8' WHEN 12 THEN 'Int32' WHEN 13 THEN 'Int64' WHEN 14 THEN 'UInt16' WHEN 15 THEN 'Float32' END AS cell_type,
                       CASE seed % 16 WHEN 0 THEN 2 WHEN 1 THEN 4 WHEN 2 THEN 2 WHEN 3 THEN 4 WHEN 4 THEN 1 WHEN 5 THEN 2 WHEN 6 THEN 4 WHEN 7 THEN 2 WHEN 8 THEN 4 WHEN 9 THEN 8 WHEN 10 THEN 8 WHEN 11 THEN 1 WHEN 12 THEN 4 WHEN 13 THEN 8 WHEN 14 THEN 2 WHEN 15 THEN 4 END AS elem_size,
                       CASE WHEN seed % 101 = 0 THEN 186 * 169
                            ELSE 64 * 64 END AS n_cells
                FROM media
            )
            SELECT cell_type,
                   CAST(count(*) AS BIGINT) AS n_tiles,
                   CAST(SUM(n_cells) AS BIGINT) AS total_cells,
                   CAST(SUM(n_cells * elem_size) AS BIGINT) AS total_bytes
            FROM typed GROUP BY cell_type
        """,
        # rect-intersection range join: tile extents (seed arithmetic,
        # ± 0.005°) × footprint bboxes (deterministic parquet dump)
        "bbox_join_counts": _MEDIA
        + """
            , geo AS (
                SELECT seed,
                       CASE WHEN seed % 10 < 6 THEN
                            (CASE seed % 3 WHEN 0 THEN -74.0 WHEN 1 THEN 2.35 ELSE 139.7 END)
                            + ((seed * 31) % 2000 - 1000) / 1000.0
                       ELSE ((seed * 9973) % 360000) / 1000.0 - 180.0 END AS lon,
                       CASE WHEN seed % 10 < 6 THEN
                            (CASE seed % 3 WHEN 0 THEN 40.7 WHEN 1 THEN 48.85 ELSE 35.7 END)
                            + ((seed * 57) % 2000 - 1000) / 1000.0
                       ELSE ((seed * 7919) % 170000) / 1000.0 - 85.0 END AS lat
                FROM media
            )
            SELECT f.footprint_id,
                   CAST(count(*) AS BIGINT) AS n_tiles
            FROM geo g
            JOIN read_parquet('/tmp/raycells_docs/footprint_bboxes.parquet') f
              ON g.lon - 0.005 <= f.maxx AND g.lon + 0.005 >= f.minx
             AND g.lat - 0.005 <= f.maxy AND g.lat + 0.005 >= f.miny
            GROUP BY f.footprint_id
        """,
        # windowed NN-resampled read (tilestore.synth_band_window):
        # window (16,16), size (32,32), out 8x8; src index per out (r,c)
        "resample_tiles": _MEDIA
        + """
            , grid AS (
                SELECT m.doc_id, m.span_idx, m.seed,
                       (16 + CAST(floor((r.range + 0.5) * 32 / 8) AS BIGINT)) * 64
                       + (16 + CAST(floor((c.range + 0.5) * 32 / 8) AS BIGINT)) AS i
                FROM media m, range(8) r, range(8) c
            ),
            vals AS (
                SELECT doc_id, span_idx, seed,
                       CASE WHEN (seed + i * 7) % 33 = 0 THEN 0
                            ELSE 1 + (seed * 2654435761 + (i + 404) * 40503) % 65520
                       END AS v
                FROM grid
            )
            SELECT doc_id, span_idx, seed,
                   CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_rs,
                   CAST(SUM(v) AS BIGINT) AS sum_rs,
                   CAST(MAX(v) AS BIGINT) AS max_rs
            FROM vals GROUP BY doc_id, span_idx, seed
        """,
        "ndvi_stats": _MEDIA
        + """
            , cells AS (
                SELECT m.doc_id, m.span_idx, m.seed, r.range AS i
                FROM media m, range(4096) r
            ),
            bands AS (
                SELECT doc_id, span_idx, seed,
                       1 + (seed * 2654435761 + (i + 404) * 40503) % 65520 AS red,
                       1 + (seed * 2654435761 + (i + 505) * 40503) % 65520 AS nir,
                       (seed + i * 7) % 33 != 0 AS ok
                FROM cells
            )
            SELECT doc_id, span_idx, seed,
                   CAST(count(*) FILTER (WHERE ok) AS BIGINT) AS n_valid,
                   MIN(CAST(nir - red AS DOUBLE) / (nir + red)) FILTER (WHERE ok) AS ndvi_min,
                   MAX(CAST(nir - red AS DOUBLE) / (nir + red)) FILTER (WHERE ok) AS ndvi_max
            FROM bands GROUP BY doc_id, span_idx, seed
        """,
        "top_dense_cells": _BAND_STATS + _GRID
        + """
            , agg AS (
                SELECT grid_cell, CAST(count(*) AS BIGINT) AS n_tiles
                FROM gridded GROUP BY grid_cell
            )
            SELECT grid_cell, n_tiles FROM agg
            ORDER BY n_tiles DESC, grid_cell DESC LIMIT 20
        """,
        "global_stats": """
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
                   MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS min_price_c,
                   MAX(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS max_price_c
            FROM lineitem
        """,
        "quantiles_qty": """
            SELECT CAST(quantile_disc(CAST(ROUND(l_quantity) AS BIGINT), 0.5) AS BIGINT) AS p50,
                   CAST(quantile_disc(CAST(ROUND(l_quantity) AS BIGINT), 0.9) AS BIGINT) AS p90,
                   CAST(quantile_disc(CAST(ROUND(l_quantity) AS BIGINT), 0.99) AS BIGINT) AS p99,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM lineitem
        """,
        "sessionize": """
            WITH flagged AS (
                SELECT user_id, ts,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS brk
                FROM events
            ),
            numbered AS (
                SELECT user_id,
                       SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
                FROM flagged
            ),
            per_session AS (
                SELECT user_id, sid, count(*) AS c
                FROM numbered GROUP BY user_id, sid
            )
            SELECT user_id,
                   CAST(SUM(c) AS BIGINT) AS n_events,
                   CAST(count(*) AS BIGINT) AS n_sessions,
                   CAST(MAX(c) AS BIGINT) AS max_session_events
            FROM per_session GROUP BY user_id
        """,
        "revenue_by_nation": """
            SELECT n.n_name,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "lineitem_pricing": """
            WITH u AS (
                SELECT l_returnflag, l_linestatus,
                       CAST(ROUND(l_quantity) AS BIGINT) AS qty,
                       CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS ep_c,
                       CAST(ROUND(l_discount * 100) AS BIGINT) AS dc_c,
                       CAST(ROUND(l_tax * 100) AS BIGINT) AS tx_c
                FROM lineitem
            )
            SELECT l_returnflag, l_linestatus,
                   CAST(count(*) AS BIGINT) AS count_order,
                   CAST(SUM(qty) AS BIGINT) AS sum_qty,
                   CAST(SUM(ep_c * (100 - dc_c)) AS BIGINT) AS sum_disc_price_e4,
                   CAST(SUM(ep_c * (100 - dc_c) * (100 + tx_c)) AS BIGINT) AS sum_charge_e6
            FROM u GROUP BY l_returnflag, l_linestatus
        """,
        "orders_by_segment": """
            SELECT c.c_mktsegment,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_totalprice_c
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "dedup_exact": """
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT text) AS BIGINT) AS n_unique_texts
            FROM documents GROUP BY source
        """,
        "token_stats": f"""
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN length(text) = 0 THEN 0
                            ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS BIGINT)
                       AS total_tokens,
                   CAST(SUM({stop_expr}) AS BIGINT) AS total_stopword_hits,
                   CAST(SUM(CASE WHEN
                        (CASE WHEN length(text) = 0 THEN 0
                              ELSE length(text) - length(replace(text, ' ', '')) + 1 END) >= 5
                        AND 2 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) >= length(text)
                        AND ({stop_expr}) >= 1
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_ok
            FROM documents GROUP BY lang
        """,
        "lang_id": f"""
            WITH scored AS (
                SELECT lang,
                       {", ".join(f"{scores[l]} AS s_{l}" for l in langs)}
                FROM documents
            ),
            detected AS (
                SELECT lang, {detect_case} AS lang_detected FROM scored
            )
            SELECT lang, lang_detected, CAST(count(*) AS BIGINT) AS n_docs
            FROM detected GROUP BY lang, lang_detected
        """,
        "normalize_text": """
            WITH norm AS (
                SELECT source,
                       regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS c,
                       trim(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS tr
                FROM documents
            )
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(length(c)) AS BIGINT) AS total_chars_clean,
                   CAST(SUM(CASE WHEN tr = '' THEN 0
                            ELSE len(string_split_regex(tr, ' +')) END) AS BIGINT)
                       AS total_tokens_clean
            FROM norm GROUP BY source
        """,
        "sample_lineitem": """
            WITH keyed AS (
                SELECT CAST(ROUND(l_quantity) AS BIGINT) AS qty
                FROM lineitem
                WHERE ((l_orderkey * 7 + l_linenumber) * 2654435761) % 97 < 10
            )
            SELECT CAST(count(*) AS BIGINT) AS n_sampled,
                   CAST(SUM(qty) AS BIGINT) AS sum_qty
            FROM keyed
        """,
        "events_daily": """
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
            FROM events GROUP BY event_type, day
        """,
        # as-of join: each event → the user's latest order at event time;
        # ties on o_orderdate break toward the greatest o_orderkey (same
        # deterministic rule as the merge_asof sort in engine/joins.py)
        "asof_latest_order": """
            SELECT event_id, o_orderkey FROM (
                SELECT e.event_id, o.o_orderkey,
                       ROW_NUMBER() OVER (
                           PARTITION BY e.event_id
                           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
                       ) AS rn
                FROM events e
                JOIN orders o
                  ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
            ) WHERE rn = 1
        """,
        "events_props_k": """
            SELECT event_type,
                   CAST((CAST(json_extract(props, '$.k') AS BIGINT) // 10) * 10
                        AS BIGINT) AS k_decade,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY event_type, k_decade
        """,
        "events_rolling7": """
            WITH daily AS (
                SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                       CAST(count(*) AS BIGINT) AS n_events,
                       CAST(date_trunc('day', ts) AS DATE) AS d
                FROM events GROUP BY event_type, day, d
            )
            SELECT event_type, day, n_events,
                   CAST(SUM(n_events) OVER (
                       PARTITION BY event_type ORDER BY d
                       RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS n_events_7d
            FROM daily
        """,
        "distinct_custs": """
            SELECT o_orderpriority,
                   CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs
            FROM orders GROUP BY o_orderpriority
        """,
        "top_parts_by_brand": """
            SELECT p_brand, rank, p_partkey, price_c FROM (
                SELECT p_brand, p_partkey,
                       CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_c,
                       CAST(ROW_NUMBER() OVER (
                           PARTITION BY p_brand
                           ORDER BY CAST(ROUND(p_retailprice * 100) AS BIGINT) DESC,
                                    p_partkey DESC
                       ) AS BIGINT) AS rank
                FROM part
            ) WHERE rank <= 3
        """,
        "priority_revenue": """
            SELECT o.o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_items,
                   CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_c
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderpriority
        """,
        "customers_no_orders": """
            SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
            FROM customer c
            WHERE NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT'
            )
            GROUP BY c_mktsegment
        """,
        "knn_embeddings": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qe
                FROM embeddings WHERE vec_id < 3
            ),
            sims AS (
                SELECT q.query_id, e.vec_id,
                       ROUND(list_cosine_similarity(q.qe, e.embedding), 6) AS sim
                FROM embeddings e CROSS JOIN q
            ),
            ranked AS (
                SELECT query_id, vec_id,
                       CAST(ROW_NUMBER() OVER
                            (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
                FROM sims
            )
            SELECT query_id, vec_id, rank FROM ranked WHERE rank <= 10
        """,
    }


_KNN_TAIL = """
, pts AS (
    SELECT seed,
           CASE WHEN seed % 10 < 6 THEN
                (CASE seed % 3 WHEN 0 THEN -74.0 WHEN 1 THEN 2.35 ELSE 139.7 END)
                + ((seed * 31) % 2000 - 1000) / 1000.0
           ELSE ((seed * 9973) % 360000) / 1000.0 - 180.0 END AS lon,
           CASE WHEN seed % 10 < 6 THEN
                (CASE seed % 3 WHEN 0 THEN 40.7 WHEN 1 THEN 48.85 ELSE 35.7 END)
                + ((seed * 57) % 2000 - 1000) / 1000.0
           ELSE ((seed * 7919) % 170000) / 1000.0 - 85.0 END AS lat
    FROM media
),
q AS (
    SELECT * FROM (VALUES (0, -74.0, 40.7), (1, 2.35, 48.85), (2, 139.7, 35.7))
    t(query_id, qlon, qlat)
),
dists AS (
    SELECT q.query_id, p.seed,
           sqrt((p.lon - q.qlon) * (p.lon - q.qlon) + (p.lat - q.qlat) * (p.lat - q.qlat)) AS dist
    FROM pts p CROSS JOIN q
),
ranked AS (
    SELECT query_id, seed,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist, seed) AS BIGINT) AS rank
    FROM dists
)
SELECT CAST(query_id AS BIGINT) AS query_id, rank, seed FROM ranked WHERE rank <= 8
"""
