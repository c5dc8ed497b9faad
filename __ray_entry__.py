"""Driver contract for the walk_ray engine.

``queries()`` maps every implemented operator/pipeline from SURVEY.md
§2 (plus the training-data-pipeline additions) to a callable over an
``sf_dir``; ``oracle_sql()`` gives the DuckDB-equivalent SQL where the
semantics are SQL-expressible (the rest get rows-only checks).

Ray is initialised by the driver BEFORE this module is imported — no
``ray.init`` / ``ray.shutdown`` happens here or anywhere downstream.

Column names in each Ray result match its oracle SQL exactly.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# Query-tuning constants shared between the Ray pipelines and the SQL
# oracles (thresholds chosen against the synthetic data distributions).
COSINE_THRESHOLD = 0.4
JACCARD_THRESHOLD = 0.9
ANN_QUERY_IDS = list(range(10))
ANN_K = 10


def entry() -> Any:
    """Flagship: the docs_graph crawl at sf0.001 → sitemap entries."""
    from walk_ray.pipelines.crawl_queries import crawl_sitemap_entries

    return crawl_sitemap_entries("/root/testdata/sf0.001")


def _orders_by_nation_native(sf_dir: str):
    import ray

    from walk_ray.pipelines import relational

    ncpu = int(ray.cluster_resources().get("CPU", 4))
    return relational.orders_by_nation_shuffle(
        sf_dir, engine="native", n_buckets=max(2, min(8, ncpu // 2)))


def queries() -> dict[str, Callable[[str], Any]]:
    from walk_ray.pipelines import crawl_queries as cq
    from walk_ray.pipelines import (dedup, multimodal, prepare, relational,
                                    similarity, text)

    return {
        # --- crawl engine (docs_graph pages derived from documents) ---
        "crawl_url_seen": cq.crawl_url_seen,
        "crawl_sitemap_entries": cq.crawl_sitemap_entries,
        "crawl_extract_text": cq.crawl_extract_text,
        "crawl_index_surt": cq.crawl_index_surt,
        "crawl_inbound_links": cq.crawl_inbound_links,
        "crawl_link_graph": cq.crawl_link_graph,
        "crawl_timespan": cq.crawl_timespan,
        "crawl_order": cq.crawl_order,  # rows-only (engine-defined order)
        # --- relational / streaming ---
        "pricing_summary": relational.pricing_summary,
        "orders_by_nation": relational.orders_by_nation,
        # same result via the partitioned hash join (no-broadcast path
        # for large dimension sides) — same oracle SQL
        "orders_by_nation_shuffle": relational.orders_by_nation_shuffle,
        # the same join through Ray's native Dataset.join (Ray >= 2.46)
        # — CI-gates the native path end to end; hash_join's version
        # guard falls back to the bucketed engine (same semantics) on
        # older Ray, so this entry is green either way. Partition count
        # scales with the cluster: each native aggregator pins 0.5 CPU,
        # so at most half the CPUs go to aggregators (the other half
        # keeps map tasks runnable — all-aggregator = deadlock).
        "orders_by_nation_shuffle_native": _orders_by_nation_native,
        "top_parts_by_revenue": relational.top_parts_by_revenue,
        "events_tumbling_window": relational.events_tumbling_window,
        "events_hopping_window": relational.events_hopping_window,
        "events_sessionize": relational.events_sessionize,
        "latest_event_per_user": relational.latest_event_per_user,
        # distributed AS-OF join (bucketed co-partition + merge_asof)
        "events_last_order": relational.events_last_order,
        # --- text analysis ---
        "token_stats": text.token_stats,
        "quality_scores": text.quality_scores,
        "lang_id": text.lang_id,
        "text_fingerprint": text.text_fingerprint,
        "winnow_fingerprints": text.winnow_fingerprints,  # rows-only (rolling-hash selection; pytest-pinned)
        "tfidf_scores": text.tfidf_scores,
        "tfidf_top_terms": lambda sf: text.tfidf_top_terms(sf, k=5),
        "hash_split": text.hash_split,
        # stratified corpus balancing: en downsampled to 30%, every
        # other stratum to 70% (md5-threshold rule, pure map)
        "stratified_sample": text.stratified_sample,
        "pack_sequences": lambda sf: text.pack_sequences(sf, budget=512),  # rows-only (reset-on-overflow cumsum; pytest-pinned)
        # PII-style regex scrubbing (rules are config; demo 'stop' rule
        # fires on the synthetic corpus so counts are non-trivial)
        "regex_redact": text.regex_redact,
        # exact-substring benchmark decontamination (bounded snippet
        # set broadcast as one compiled alternation — no join)
        "decontaminate": text.decontaminate,
        # Gopher-style repetition signals (top/duplicate bigram mass)
        "repetition_stats": text.repetition_stats,
        # batched model inference shape: hashed-BoW linear classifier,
        # weights loaded once per actor, vectorized per batch
        "classifier_scores": text.classifier_scores,
        # corpus bigram-LM perplexity (CCNet-shaped quality signal):
        # LM train + doc scoring complete inside one hash(w1)
        # co-partition; skinny doc-combine exchange after
        "lm_perplexity": text.lm_perplexity,
        # --- dedup ---
        "exact_dedup": dedup.exact_dedup,
        # duplicate RESOLUTION policy: keep the highest-quality copy
        # per exact-dup cluster (tie -> min doc_id), not an arbitrary one
        "dedup_keep_best": dedup.dedup_keep_best,
        # CCNet-style chunk-level exact dedup + document reassembly
        # (keep each distinct 5-word chunk's first occurrence)
        "chunk_dedup": dedup.chunk_dedup,
        # the composed corpus-preparation flagship: quality filter →
        # chunk dedup → split assignment, one lazy Dataset program,
        # oracle-checked end to end
        "prepare_corpus": prepare.prepare_corpus,
        "unigram_jaccard_pairs": lambda sf: dedup.ngram_jaccard_pairs(
            sf, n=1, threshold=JACCARD_THRESHOLD, exact=True
        ),
        # the SCALE path (LSH candidates + pairs⋈grams exact verify) —
        # oracle-gated against the same exact-Jaccard SQL: on this data
        # LSH blocking reaches full recall, so outputs must match
        "unigram_jaccard_pairs_lsh": lambda sf: dedup.ngram_jaccard_pairs(
            sf, n=1, threshold=JACCARD_THRESHOLD, exact=False
        ),
        "embedding_cosine_pairs": lambda sf: dedup.embedding_cosine_pairs(
            sf, threshold=COSINE_THRESHOLD
        ),
        # IVF-cell-blocked near-dup pairs (the 100-TB path), oracle-
        # gated against the exact all-pairs SQL (full recall here)
        "embedding_cosine_pairs_ivf": lambda sf: dedup.embedding_cosine_pairs_blocked(
            sf, threshold=COSINE_THRESHOLD
        ),
        "minhash_lsh_dedup": lambda sf: dedup.minhash_lsh_dedup(
            sf, ngram=1, threshold=JACCARD_THRESHOLD
        ),  # rows-only (LSH is approximate)
        "simhash_dedup": lambda sf: dedup.simhash_dedup(sf, max_hamming=3),
        # oracle-checked end-to-end: IVF-blocked pairs + distributed
        # min-label CC vs DuckDB exact pairs + recursive-CTE closure
        "embedding_dedup": lambda sf: dedup.embedding_dedup(
            sf, threshold=COSINE_THRESHOLD
        ),
        # --- similarity search ---
        "ann_brute_topk": lambda sf: similarity.ann_brute_topk(sf, ANN_QUERY_IDS, ANN_K),
        "ann_ivf_topk": lambda sf: similarity.ann_ivf_topk(sf, ANN_QUERY_IDS, ANN_K),  # rows-only
        # IVF at nprobe == nlist probes every cell → must equal brute
        # force exactly, so the brute SQL is a valid oracle for the
        # whole index+probe machinery (the pruned variant above stays
        # rows-only for the recall check)
        "ann_ivf_topk_fullprobe": lambda sf: similarity.ann_ivf_topk(
            sf, ANN_QUERY_IDS, ANN_K, nlist=16, nprobe=16
        ),
        # --- multimodal plumbing (synthetic media, fake decoder) ---
        "media_features": lambda sf: multimodal.media_features(sf),  # rows-only
        "media_near_dup": lambda sf: multimodal.media_near_dup(sf),  # rows-only
    }


# Shared recursive-CTE prefix: the docs_graph reachable set
# (doc i links to (2i+1) mod N and (3i+7) mod N, seed = 0) — the SQL
# twin of the crawl's frontier fixed point.
_REACH = """
WITH RECURSIVE reach(i) AS (
    SELECT CAST(0 AS BIGINT)
    UNION
    SELECT CAST((m.f1 * r.i + m.f2) % (SELECT count(*) FROM documents) AS BIGINT)
    FROM reach r, (VALUES (2, 1), (3, 7)) m(f1, f2)
)
"""

_WORDS = "string_split_regex(trim(text), '\\s+')"
_STOPLIST = "('the', 'a', 'of', 'and', 'to')"

# Exact cosine top-k — the oracle for ann_brute_topk AND for
# ann_ivf_topk_fullprobe (nprobe == nlist probes every cell, so the
# IVF machinery must reproduce brute force exactly).
_ANN_TOPK_SQL = f"""
    WITH q AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id IN ({', '.join(str(i) for i in ANN_QUERY_IDS)})
    ), sims AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])) AS c
        FROM q, embeddings e WHERE e.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, ROUND(c, 6) AS cosine,
           CAST(rn AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rn
        FROM sims
    ) WHERE rn <= {ANN_K}"""


def oracle_sql() -> dict[str, str]:
    n_docs = "(SELECT count(*) FROM documents)"
    return {
        "crawl_url_seen": _REACH + f"""
            SELECT 'http://docs.test/doc/' || CAST(i AS VARCHAR) AS url,
                   CAST(4 AS UTINYINT) AS status,
                   CAST(1 AS INTEGER) AS attempts,
                   CAST(200 AS INTEGER) AS prev_status
            FROM reach""",
        "crawl_sitemap_entries": _REACH + f"""
            SELECT 'http://docs.test/doc/' || CAST(i AS VARCHAR) AS key,
                   'http://docs.test/doc/' || CAST(i AS VARCHAR) AS url,
                   'Doc ' || CAST(i AS VARCHAR) AS title,
                   CAST(200 AS BIGINT) AS status,
                   CAST(CASE WHEN (2*i+1) % {n_docs} = (3*i+7) % {n_docs}
                        THEN 1 ELSE 2 END AS BIGINT) AS n_links
            FROM reach""",
        "crawl_extract_text": _REACH + f"""
            SELECT 'http://docs.test/doc/' || CAST(d.doc_id AS VARCHAR) AS url,
                   'Doc ' || CAST(d.doc_id AS VARCHAR) AS title,
                   'Doc ' || CAST(d.doc_id AS VARCHAR) || ' Doc ' || CAST(d.doc_id AS VARCHAR)
                   || ' ' || regexp_replace(trim(d.text), '\\s+', ' ', 'g')
                   || ' next ' || CAST((2*d.doc_id+1) % {n_docs} AS VARCHAR)
                   || ' jump ' || CAST((3*d.doc_id+7) % {n_docs} AS VARCHAR) AS text
            FROM documents d JOIN reach r ON r.i = d.doc_id""",
        "crawl_index_surt": _REACH + """
            SELECT 'test,docs)/doc/' || CAST(i AS VARCHAR) AS surt_url,
                   'http://docs.test/doc/' || CAST(i AS VARCHAR) AS url,
                   CAST(200 AS INTEGER) AS status
            FROM reach""",
        "crawl_inbound_links": _REACH + f"""
            SELECT 'http://docs.test/doc/' || CAST(i AS VARCHAR) AS url
            FROM reach
            WHERE (2*i+1) % {n_docs} = 0 OR (3*i+7) % {n_docs} = 0""",
        "crawl_link_graph": _REACH + f"""
            , links AS (
                SELECT 'http://docs.test/doc/' || CAST(i AS VARCHAR) AS src,
                       'http://docs.test/doc/' || CAST((2*i+1) % {n_docs} AS VARCHAR) AS dst
                FROM reach
                UNION
                SELECT 'http://docs.test/doc/' || CAST(i AS VARCHAR) AS src,
                       'http://docs.test/doc/' || CAST((3*i+7) % {n_docs} AS VARCHAR) AS dst
                FROM reach
            )
            SELECT dst, CAST(COUNT(DISTINCT src) AS BIGINT) AS n_inbound
            FROM links GROUP BY dst""",
        "crawl_timespan": _REACH + """
            SELECT CAST(1514764800 + MIN(i) AS BIGINT) AS min_ts,
                   CAST(1514764800 + MAX(i) AS BIGINT) AS max_ts
            FROM reach""",
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 4) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_revenue,
                   COUNT(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "orders_by_nation_shuffle": """
            SELECT n.n_name,
                   COUNT(*) AS n_orders,
                   ROUND(SUM(o.o_totalprice), 4) AS total_price
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name""",
        "orders_by_nation_shuffle_native": """
            SELECT n.n_name,
                   COUNT(*) AS n_orders,
                   ROUND(SUM(o.o_totalprice), 4) AS total_price
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name""",
        "orders_by_nation": """
            SELECT n.n_name,
                   COUNT(*) AS n_orders,
                   ROUND(SUM(o.o_totalprice), 4) AS total_price
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name""",
        "top_parts_by_revenue": """
            SELECT l_partkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem GROUP BY l_partkey
            ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, l_partkey
            LIMIT 20""",
        "events_tumbling_window": """
            SELECT event_type,
                   CAST(FLOOR(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 4) AS sum_value
            FROM events GROUP BY event_type, window_start""",
        "events_hopping_window": """
            WITH e AS (
                SELECT event_type, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t, value
                FROM events
            )
            SELECT event_type, CAST(u.s AS BIGINT) AS window_start,
                   COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
            FROM e, UNNEST(generate_series((t // 900) * 900 - 2700,
                                           (t // 900) * 900, 900)) AS u(s)
            GROUP BY event_type, u.s""",
        "events_sessionize": """
            WITH ordered AS (
                SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec, value,
                       LAG(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                FROM events
            ), flagged AS (
                SELECT *, CASE WHEN prev_ts IS NULL OR ts_sec - prev_ts > 1800
                               THEN 1 ELSE 0 END AS new_session
                FROM ordered
            ), sessions AS (
                SELECT *, SUM(new_session) OVER (
                    PARTITION BY user_id ORDER BY ts_sec
                    ROWS UNBOUNDED PRECEDING) AS session_id
                FROM flagged
            )
            SELECT user_id,
                   MIN(ts_sec) AS session_start,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 4) AS sum_value
            FROM sessions GROUP BY user_id, session_id""",
        "events_last_order": """
            SELECT e.event_id, CAST(FLOOR(epoch(o.o_orderdate)) AS BIGINT) AS last_order_ts
            FROM events e ASOF JOIN orders o
              ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts""",
        "latest_event_per_user": """
            SELECT user_id, event_id, event_type, value FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                FROM events
            ) WHERE rn = 1""",
        "token_stats": f"""
            SELECT doc_id,
                   CAST(len({_WORDS}) AS BIGINT) AS n_ws_tokens,
                   CAST(len(regexp_extract_all(text,
                        '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS BIGINT) AS n_bpe_tokens
            FROM documents""",
        "quality_scores": f"""
            WITH base AS (
                SELECT doc_id,
                       CAST(length(text) AS BIGINT) AS n_chars,
                       CAST(len({_WORDS}) AS BIGINT) AS n_words,
                       CAST(len(list_filter({_WORDS},
                            w -> w IN {_STOPLIST})) AS BIGINT) AS n_stopwords,
                       CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)
                           AS total_wlen
                FROM documents
            )
            SELECT doc_id, n_chars, n_words, n_stopwords,
                   ROUND(CAST(total_wlen AS DOUBLE) / GREATEST(n_words, 1), 6)
                       AS mean_word_len,
                   ROUND(CAST(n_stopwords AS DOUBLE) / GREATEST(n_words, 1), 6)
                       AS stop_ratio,
                   ROUND(LEAST(CAST(n_words AS DOUBLE) / 100, 1.0)
                         * (1 - ROUND(CAST(n_stopwords AS DOUBLE)
                                      / GREATEST(n_words, 1), 6)), 6) AS quality
            FROM base""",
        "lang_id": f"""
            WITH counts AS (
                SELECT doc_id,
                       len(list_filter({_WORDS}, w -> w IN ('the','a','and'))) AS c_en,
                       len(list_filter({_WORDS}, w -> w IN ('der','die','und'))) AS c_de,
                       len(list_filter({_WORDS}, w -> w IN ('el','la','los'))) AS c_es,
                       len(list_filter({_WORDS}, w -> w IN ('le','les','des'))) AS c_fr
                FROM documents
            )
            SELECT doc_id,
                   CASE WHEN c_fr > GREATEST(c_en, c_de, c_es) THEN 'fr'
                        WHEN c_es > GREATEST(c_en, c_de) THEN 'es'
                        WHEN c_de > c_en THEN 'de'
                        ELSE 'en' END AS pred_lang
            FROM counts""",
        "text_fingerprint": "SELECT doc_id, md5(text) AS fp_md5 FROM documents",
        "tfidf_scores": f"""
            WITH toks AS (
                SELECT doc_id, w AS term, COUNT(*) AS tf
                FROM (SELECT doc_id, unnest({_WORDS}) AS w FROM documents
                      WHERE text IS NOT NULL AND trim(text) <> '')
                GROUP BY doc_id, w
            ), dfreq AS (
                SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
            ), n AS (SELECT COUNT(*) AS n FROM documents)
            SELECT t.doc_id, t.term, CAST(t.tf AS BIGINT) AS tf,
                   CAST(d.df AS BIGINT) AS df,
                   ROUND(t.tf * LN(CAST(n.n AS DOUBLE) / d.df), 6) AS tfidf
            FROM toks t JOIN dfreq d USING (term), n""",
        "tfidf_top_terms": f"""
            WITH toks AS (
                SELECT doc_id, w AS term, COUNT(*) AS tf
                FROM (SELECT doc_id, unnest({_WORDS}) AS w FROM documents
                      WHERE text IS NOT NULL AND trim(text) <> '')
                GROUP BY doc_id, w
            ), dfreq AS (
                SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
            ), n AS (SELECT COUNT(*) AS n FROM documents),
            scored AS (
                SELECT t.doc_id, t.term,
                       ROUND(t.tf * LN(CAST(n.n AS DOUBLE) / d.df), 6) AS tfidf
                FROM toks t JOIN dfreq d USING (term), n
            ), ranked AS (
                SELECT doc_id, term, tfidf, ROW_NUMBER() OVER (
                    PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
                FROM scored
            )
            SELECT doc_id, term, tfidf, CAST(rank AS BIGINT) AS rank
            FROM ranked WHERE rank <= 5""",
        "hash_split": """
            SELECT doc_id, CASE
                WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 1000000 < 900000 THEN 'train'
                WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 1000000 < 950000 THEN 'val'
                ELSE 'test' END AS split
            FROM documents""",
        "stratified_sample": """
            SELECT doc_id, lang FROM documents
            WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 1000000
                  < CASE WHEN lang = 'en' THEN 300000 ELSE 700000 END""",
        # the bigram LM run verbatim in SQL: same additive smoothing,
        # same ln/exp; docs with no bigram score exactly 1.0
        "lm_perplexity": f"""
            WITH words AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
            bi AS (SELECT doc_id, ws[gs] AS w1, ws[gs + 1] AS w2
                   FROM words,
                        UNNEST(generate_series(1, len(ws) - 1)) AS t(gs)),
            bc AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY w1, w2),
            pc AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY w1),
            sc AS (SELECT b.doc_id,
                          SUM(LN((bc.c2 + 1.0) / (pc.c1 + 4096.0))) AS s,
                          COUNT(*) AS n
                   FROM bi b JOIN bc USING (w1, w2) JOIN pc USING (w1)
                   GROUP BY b.doc_id)
            SELECT w.doc_id, CAST(COALESCE(n, 0) AS BIGINT) AS n_bigrams,
                   ROUND(CASE WHEN n > 0 THEN EXP(-s / n) ELSE 1.0 END, 6)
                       AS perplexity
            FROM words w LEFT JOIN sc USING (doc_id)""",
        # the hashed-BoW linear model run verbatim in SQL: md5-prefix
        # feature hashing, Knuth-multiplicative weights, sigmoid(mean)
        "classifier_scores": f"""
            SELECT doc_id,
                   CASE WHEN trim(COALESCE(text, '')) = ''
                        THEN CAST(0 AS BIGINT)
                        ELSE CAST(len({_WORDS}) AS BIGINT)
                   END AS n_tokens,
                   CASE WHEN trim(COALESCE(text, '')) = '' THEN 0.5
                   ELSE ROUND(1.0 / (1.0 + EXP(-(COALESCE(list_sum(
                       list_transform({_WORDS}, tok ->
                           CAST((CAST(('0x' || substr(md5(tok), 1, 8))
                                      AS BIGINT) % 65536)
                                * 2654435761 % 4294967296 AS DOUBLE)
                           / 4294967296.0 - 0.5)), 0)
                       / GREATEST(len({_WORDS}), 1)))), 6)
                   END AS score
            FROM documents""",
        # identical RE2-compatible pattern strings as text.REDACT_RULES;
        # counts on the original text, replacements applied in order
        "regex_redact": """
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(
                       COALESCE(text, ''),
                       '[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\\.[A-Za-z0-9.-]+',
                       '<EMAIL>', 'g'),
                       '\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b',
                       '<PHONE>', 'g'),
                       '\\b(?:the)\\b', '<STOP>', 'g') AS clean_text,
                   CAST(len(regexp_extract_all(COALESCE(text, ''),
                       '[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\\.[A-Za-z0-9.-]+'))
                       AS BIGINT) AS n_email,
                   CAST(len(regexp_extract_all(COALESCE(text, ''),
                       '\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b'))
                       AS BIGINT) AS n_phone,
                   CAST(len(regexp_extract_all(COALESCE(text, ''),
                       '\\b(?:the)\\b')) AS BIGINT) AS n_stop
            FROM documents""",
        "decontaminate": """
            WITH snip AS (
                SELECT DISTINCT array_to_string(list_slice(
                    string_split(COALESCE(text, ''), ' '), 1, 5), ' ') AS s
                FROM documents WHERE doc_id % 13 = 0 AND doc_id < 1000)
            SELECT d.doc_id,
                   CAST(EXISTS(SELECT 1 FROM snip
                               WHERE trim(s) <> ''
                                 AND contains(COALESCE(d.text, ''), s))
                        AS BIGINT) AS contaminated
            FROM documents d""",
        "repetition_stats": """
            WITH words AS (
                SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS ws
                FROM documents
            ), bi AS (
                SELECT doc_id, ws[gs] || ' ' || ws[gs + 1] AS bg
                FROM words, UNNEST(generate_series(1, len(ws) - 1)) AS t(gs)
            ), cnt AS (
                SELECT doc_id, bg, COUNT(*) AS c FROM bi GROUP BY doc_id, bg
            ), agg AS (
                SELECT doc_id, SUM(c) AS nb, MAX(c) AS tb, COUNT(*) AS nd
                FROM cnt GROUP BY doc_id
            )
            SELECT w.doc_id,
                   CAST(len(ws) AS BIGINT) AS n_words,
                   CAST(COALESCE(nb, 0) AS BIGINT) AS n_bigrams,
                   CAST(COALESCE(tb, 0) AS BIGINT) AS top_bigram_n,
                   CAST(COALESCE(nb - nd, 0) AS BIGINT) AS dup_bigram_excess,
                   ROUND(CAST(COALESCE(tb, 0) AS DOUBLE)
                         / GREATEST(COALESCE(nb, 0), 1), 6) AS top_bigram_frac
            FROM words w LEFT JOIN agg USING (doc_id)""",
        "chunk_dedup": """
            WITH words AS (
                SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS ws
                FROM documents
            ), chunks AS (
                SELECT doc_id, gs AS ci,
                       array_to_string(list_slice(ws, 5 * (gs - 1) + 1, 5 * gs),
                                       ' ') AS chunk,
                       CAST(ceil(len(ws) / 5.0) AS BIGINT) AS n_chunks_total
                FROM words,
                     UNNEST(generate_series(
                         1, CAST(ceil(len(ws) / 5.0) AS BIGINT))) AS t(gs)
            ), win AS (
                SELECT * FROM (
                    SELECT *, ROW_NUMBER() OVER (
                        PARTITION BY chunk ORDER BY doc_id, ci) AS rn
                    FROM chunks) WHERE rn = 1
            )
            SELECT doc_id,
                   string_agg(chunk, ' ' ORDER BY ci) AS clean_text,
                   CAST(COUNT(*) AS BIGINT) AS n_chunks_kept,
                   CAST(ANY_VALUE(n_chunks_total) AS BIGINT) AS n_chunks_total
            FROM win GROUP BY doc_id""",
        # the full composed pipeline in one SQL: quality gate (same
        # expression as dedup_keep_best) → chunk dedup (same CTEs as
        # chunk_dedup) → md5-boundary split (same CASE as hash_split)
        "prepare_corpus": f"""
            WITH kept AS (
                SELECT doc_id, text FROM documents
                WHERE ROUND(LEAST(CAST(len({_WORDS}) AS DOUBLE) / 100, 1.0)
                      * (1 - ROUND(CAST(len(list_filter({_WORDS},
                                w -> w IN {_STOPLIST})) AS DOUBLE)
                           / GREATEST(len({_WORDS}), 1), 6)), 6) >= 0.5
            ), words AS (
                SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS ws
                FROM kept
            ), chunks AS (
                SELECT doc_id, gs AS ci,
                       array_to_string(list_slice(ws, 5 * (gs - 1) + 1, 5 * gs),
                                       ' ') AS chunk,
                       CAST(ceil(len(ws) / 5.0) AS BIGINT) AS n_chunks_total
                FROM words,
                     UNNEST(generate_series(
                         1, CAST(ceil(len(ws) / 5.0) AS BIGINT))) AS t(gs)
            ), win AS (
                SELECT * FROM (
                    SELECT *, ROW_NUMBER() OVER (
                        PARTITION BY chunk ORDER BY doc_id, ci) AS rn
                    FROM chunks) WHERE rn = 1
            ), reassembled AS (
                SELECT doc_id,
                       string_agg(chunk, ' ' ORDER BY ci) AS clean_text,
                       CAST(COUNT(*) AS BIGINT) AS n_chunks_kept,
                       CAST(ANY_VALUE(n_chunks_total) AS BIGINT)
                           AS n_chunks_total
                FROM win GROUP BY doc_id
            )
            SELECT *, CASE
                WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 1000000 < 900000 THEN 'train'
                WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 1000000 < 950000 THEN 'val'
                ELSE 'test' END AS split
            FROM reassembled""",
        "dedup_keep_best": f"""
            WITH scored AS (
                SELECT md5(text) AS text_hash, doc_id,
                       ROUND(LEAST(CAST(len({_WORDS}) AS DOUBLE) / 100, 1.0)
                             * (1 - ROUND(CAST(len(list_filter({_WORDS},
                                       w -> w IN {_STOPLIST})) AS DOUBLE)
                                  / GREATEST(len({_WORDS}), 1), 6)), 6) AS quality
                FROM documents
            )
            SELECT text_hash, doc_id, quality, n_copies FROM (
                SELECT text_hash, doc_id, quality,
                       COUNT(*) OVER (PARTITION BY text_hash) AS n_copies,
                       ROW_NUMBER() OVER (PARTITION BY text_hash
                           ORDER BY quality DESC, doc_id) AS rn
                FROM scored
            ) WHERE rn = 1""",
        "exact_dedup": """
            SELECT md5(text) AS text_hash,
                   MIN(doc_id) AS doc_id,
                   COUNT(*) AS n_copies
            FROM documents GROUP BY md5(text)""",
        # the WHOLE simhash pipeline recomputed in SQL: md5-prefix
        # 64-bit word digests (simhash bit i weighs digest bit 63-i,
        # the np.unpackbits layout), tf-weighted sign per bit, then the
        # exact Hamming<=3 pair set via bit_count(xor())
        "simhash_dedup": r"""
            WITH wc AS (
                SELECT doc_id, w, COUNT(*) AS cnt
                FROM (SELECT doc_id,
                             unnest(string_split_regex(
                                 trim(COALESCE(text, '')), '\s+')) AS w
                      FROM documents
                      WHERE trim(COALESCE(text, '')) <> '')
                GROUP BY doc_id, w
            ), wh AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5(w), 1, 16)) AS UBIGINT) AS h,
                       cnt
                FROM wc
            ), acc AS (
                SELECT doc_id, i,
                       SUM(CASE WHEN (h >> (63 - i)) & 1 = 1
                                THEN cnt ELSE -cnt END) AS s
                FROM wh, (SELECT unnest(generate_series(0, 63)) AS i)
                GROUP BY doc_id, i
            ), sh0 AS (
                SELECT doc_id,
                       CAST(SUM(CASE WHEN s > 0
                                THEN CAST(CAST(1 AS UBIGINT) << i AS HUGEINT)
                                ELSE 0 END) AS UBIGINT) AS simhash
                FROM acc GROUP BY doc_id
            ), sh AS (
                SELECT d.doc_id, COALESCE(s.simhash, 0) AS simhash
                FROM documents d LEFT JOIN sh0 s USING (doc_id)
            )
            SELECT x.doc_id AS a, y.doc_id AS b,
                   CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT)
                       AS hamming
            FROM sh x JOIN sh y ON x.doc_id < y.doc_id
            WHERE bit_count(xor(x.simhash, y.simhash)) <= 3""",
        "unigram_jaccard_pairs": f"""
            WITH grams AS (
                SELECT doc_id, list_distinct({_WORDS}) AS g FROM documents
            ), pairs AS (
                SELECT a.doc_id AS a, b.doc_id AS b,
                       CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                       / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS j
                FROM grams a, grams b WHERE a.doc_id < b.doc_id
            )
            SELECT a, b, ROUND(j, 6) AS jaccard
            FROM pairs WHERE j >= {JACCARD_THRESHOLD}""",
        "unigram_jaccard_pairs_lsh": f"""
            WITH grams AS (
                SELECT doc_id, list_distinct({_WORDS}) AS g FROM documents
            ), pairs AS (
                SELECT a.doc_id AS a, b.doc_id AS b,
                       CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                       / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS j
                FROM grams a, grams b WHERE a.doc_id < b.doc_id
            )
            SELECT a, b, ROUND(j, 6) AS jaccard
            FROM pairs WHERE j >= {JACCARD_THRESHOLD}""",
        "embedding_cosine_pairs": f"""
            WITH pairs AS (
                SELECT a.vec_id AS a, b.vec_id AS b,
                       list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                              CAST(b.embedding AS DOUBLE[])) AS c
                FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id
            )
            SELECT a, b, ROUND(c, 6) AS cosine
            FROM pairs WHERE c >= {COSINE_THRESHOLD}""",
        "embedding_cosine_pairs_ivf": f"""
            WITH pairs AS (
                SELECT a.vec_id AS a, b.vec_id AS b,
                       list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                              CAST(b.embedding AS DOUBLE[])) AS c
                FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id
            )
            SELECT a, b, ROUND(c, 6) AS cosine
            FROM pairs WHERE c >= {COSINE_THRESHOLD}""",
        # full oracle for the clustered dedup output: exact cosine
        # pairs (the IVF-blocked pairs are oracle-equal to these) +
        # transitive closure; cluster_id = min node of the component,
        # exactly components_distributed's min-label fixed point
        "embedding_dedup": f"""
            WITH RECURSIVE pairs AS (
                SELECT a.vec_id AS a, b.vec_id AS b
                FROM embeddings a, embeddings b
                WHERE a.vec_id < b.vec_id
                  AND list_cosine_similarity(
                        CAST(a.embedding AS DOUBLE[]),
                        CAST(b.embedding AS DOUBLE[])) >= {COSINE_THRESHOLD}
            ), edges AS (
                SELECT a AS src, b AS dst FROM pairs
                UNION
                SELECT b AS src, a AS dst FROM pairs
            ), reach(node, m) AS (
                SELECT src, src FROM edges
                UNION
                SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.m
            )
            SELECT node AS vec_id, MIN(m) AS cluster_id
            FROM reach GROUP BY node ORDER BY vec_id""",
        "ann_brute_topk": _ANN_TOPK_SQL,
        # full-probe IVF must reproduce brute force bit-for-bit —
        # same oracle on purpose
        "ann_ivf_topk_fullprobe": _ANN_TOPK_SQL,
    }
