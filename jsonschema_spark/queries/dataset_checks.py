"""Dataset-level checks: column stats, sketches, uniqueness, referential integrity, drift (SURVEY §2.7, north rule)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from jsonschema_spark.plans import SparkPlanCompiler

from jsonschema_spark.queries.base import (
    _t,
)

# --------------------------------------------------------------------------
# Dataset-level checks (SURVEY §2.7, north rule)
# --------------------------------------------------------------------------


def stats_numeric_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass long-form profile via column_stats (one scan for all
    columns — the per-column-agg-then-union shape scans the table N times)."""
    from jsonschema_spark.operators.stats import column_stats

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    return column_stats(
        _t(spark, sf_dir, "lineitem").select(*cols), cols, stringify=False
    ).drop("null_rate")


ORACLE_STATS_LINEITEM = """
SELECT 'l_quantity' AS column, count(*) AS n_rows, count(l_quantity) AS n_present,
       min(l_quantity) AS min_value, max(l_quantity) AS max_value FROM lineitem
UNION ALL
SELECT 'l_extendedprice', count(*), count(l_extendedprice), min(l_extendedprice), max(l_extendedprice) FROM lineitem
UNION ALL
SELECT 'l_discount', count(*), count(l_discount), min(l_discount), max(l_discount) FROM lineitem
UNION ALL
SELECT 'l_tax', count(*), count(l_tax), min(l_tax), max(l_tax) FROM lineitem
"""


def _perturb_repetition(doc_id: Column, text: Column) -> Column:
    """Deterministic corruption for non-vacuous repetition oracles (the
    content_validate_props 1-in-7 pattern): every doc_id%3==0 doc gets its
    37-char prefix duplicated as two extra lines (intra-doc repetition);
    every remaining doc_id%4==1 doc gets a shared boilerplate line
    (cross-doc repetition). Mirrored literally in the oracle SQL."""
    p = F.substring(text, 1, 37)
    return (
        F.when(doc_id % 3 == 0, F.concat_ws("\n", p, p, text))
        .when(doc_id % 4 == 1, F.concat_ws("\n", F.lit("subscribe to our newsletter"), text))
        .otherwise(text)
    )


_SQL_PERTURB_REPETITION = """CASE
  WHEN doc_id % 3 = 0 THEN substr(text, 1, 37) || chr(10) || substr(text, 1, 37) || chr(10) || text
  WHEN doc_id % 4 = 1 THEN 'subscribe to our newsletter' || chr(10) || text
  ELSE text END"""


def repetition_signals_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-doc repetition: duplicate-line fraction + the char
    mass in duplicated lines, over deterministically perturbed docs."""
    from jsonschema_spark.operators.repetition import line_repetition_signals

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", _perturb_repetition(F.col("doc_id"), F.col("text")).alias("text")
    )
    out = line_repetition_signals(d, "doc_id", "text")
    return out.select(
        "id", F.col("n_lines").cast("long").alias("n_lines"), "dup_line_frac", "dup_line_char_frac"
    )


ORACLE_REPETITION_SIGNALS = f"""
WITH t AS (
  SELECT doc_id AS id, {_SQL_PERTURB_REPETITION} AS text2 FROM documents),
l AS (
  SELECT id, list_filter(string_split(text2, chr(10)), x -> length(trim(x)) > 0) AS lines
  FROM t)
SELECT id, len(lines) AS n_lines,
       CASE WHEN len(lines) > 0
            THEN 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines)
            ELSE 0.0 END AS dup_line_frac,
       CASE WHEN coalesce(list_sum([length(x) FOR x IN lines]), 0) > 0
            THEN CAST(coalesce(list_sum([length(x) FOR x IN lines IF len(list_filter(lines, y -> y = x)) > 1]), 0) AS DOUBLE)
                 / list_sum([length(x) FOR x IN lines])
            ELSE 0.0 END AS dup_line_char_frac
FROM l
"""


def top_bigram_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent word bigram per doc and its character coverage."""
    from jsonschema_spark.operators.repetition import top_ngram_coverage

    return top_ngram_coverage(_t(spark, sf_dir, "documents"), "doc_id", "text", n=2)


ORACLE_TOP_BIGRAM = """
WITH t AS (
  SELECT doc_id AS id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents),
g AS (
  SELECT id, list_sum([length(x) FOR x IN toks]) AS total_chars,
         list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
  FROM t),
e AS (SELECT id, total_chars, unnest(bigrams) AS gram FROM g),
c AS (SELECT id, total_chars, gram, count(*) AS cnt FROM e GROUP BY 1, 2, 3),
r AS (
  SELECT id, total_chars, gram, cnt,
         row_number() OVER (PARTITION BY id ORDER BY cnt DESC, gram ASC) AS rn
  FROM c)
SELECT g.id, r.gram AS top_ngram,
       coalesce(least(CAST(r.cnt * (length(r.gram) - 1) AS DOUBLE) / g.total_chars, 1.0), 0.0)
         AS top_ngram_char_frac
FROM g LEFT JOIN r ON r.id = g.id AND r.rn = 1
"""


def boilerplate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus boilerplate scoring over the perturbed docs: fraction of
    each doc's paragraphs that appear in >= 2 distinct documents."""
    from jsonschema_spark.operators.repetition import repeated_paragraph_filter

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", _perturb_repetition(F.col("doc_id"), F.col("text")).alias("text")
    )
    return repeated_paragraph_filter(d, "doc_id", "text", min_repeats=2, max_repeated_frac=0.3)


ORACLE_BOILERPLATE = f"""
WITH t AS (
  SELECT doc_id AS id, {_SQL_PERTURB_REPETITION} AS text2 FROM documents),
p AS (
  SELECT id, unnest(list_filter(string_split(text2, chr(10)), x -> length(trim(x)) > 0)) AS para
  FROM t),
h AS (SELECT id, md5(lower(trim(para))) AS ph FROM p),
c AS (SELECT ph, count(DISTINCT id) AS docs_with FROM h GROUP BY 1),
s AS (
  SELECT h.id, count(*) AS n_paras,
         CAST(sum(CAST(c.docs_with >= 2 AS INT)) AS BIGINT) AS n_rep
  FROM h JOIN c USING (ph) GROUP BY 1)
SELECT id, n_paras, CAST(n_rep AS DOUBLE) / n_paras AS repeated_para_frac,
       CAST(n_rep AS DOUBLE) / n_paras < 0.3 AS keep
FROM s
"""


def clean_boilerplate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style line-wise dedup: REMOVE corpus-boilerplate lines
    (normalized hash in >= 2 distinct docs — the injected newsletter line
    plus natural dups) and rebuild each doc's text in original line order."""
    from jsonschema_spark.operators.repetition import remove_repeated_paragraphs

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", _perturb_repetition(F.col("doc_id"), F.col("text")).alias("text")
    )
    out = remove_repeated_paragraphs(d, "doc_id", "text", min_repeats=2)
    return out.select("id", "text", "n_lines", "n_removed")


ORACLE_CLEAN_BOILERPLATE = f"""
WITH src AS (SELECT doc_id, {_SQL_PERTURB_REPETITION} AS text2 FROM documents),
l AS (
  SELECT doc_id AS id,
         list_filter(string_split(text2, chr(10)), x -> length(trim(x)) > 0) AS lines
  FROM src),
e AS (
  SELECT id, unnest(lines) AS line, generate_subscripts(lines, 1) AS pos FROM l),
h AS (SELECT id, pos, line, md5(lower(trim(line))) AS ph FROM e),
flagged AS (SELECT ph FROM h GROUP BY ph HAVING count(DISTINCT id) >= 2),
kept AS (SELECT h.* FROM h LEFT JOIN flagged f USING (ph) WHERE f.ph IS NULL),
rebuilt AS (
  SELECT id, string_agg(line, chr(10) ORDER BY pos) AS text,
         count(*) AS n_kept
  FROM kept GROUP BY 1),
totals AS (SELECT id, count(*) AS n_lines FROM h GROUP BY 1)
SELECT t.id, coalesce(r.text, '') AS text,
       CAST(t.n_lines AS BIGINT) AS n_lines,
       CAST(t.n_lines - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
FROM totals t LEFT JOIN rebuilt r USING (id)
"""


def substring_dup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-window stats: per doc, the fraction of
    its distinct 8-token rolling windows whose hash appears in >= 2 distinct
    documents (the synth corpus's native near/exact duplicates make the
    positive set non-trivial)."""
    from jsonschema_spark.operators.dedup import window_dup_stats

    d = _t(spark, sf_dir, "documents", hot=True)
    return window_dup_stats(d, "doc_id", "text", k=8, min_docs=2, max_dup_frac=0.5)


ORACLE_SUBSTRING_DUP = """
WITH t AS (SELECT doc_id AS id,
       string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents),
w AS (
  SELECT id, md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS wh
  FROM t, unnest(range(1, len(toks) - 8 + 2)) AS r(i)
  WHERE len(toks) >= 8),
d AS (SELECT DISTINCT id, wh FROM w),
c AS (SELECT wh, count(DISTINCT id) AS docs_with FROM d GROUP BY 1),
s AS (SELECT d.id, count(*) AS n_windows,
             CAST(sum(CAST(c.docs_with >= 2 AS INT)) AS BIGINT) AS n_dup
      FROM d JOIN c USING (wh) GROUP BY 1)
SELECT i.id, CAST(coalesce(s.n_windows, 0) AS BIGINT) AS n_windows,
       CAST(coalesce(s.n_dup, 0) AS BIGINT) AS n_dup,
       CAST(coalesce(s.n_dup, 0) AS DOUBLE) / greatest(coalesce(s.n_windows, 0), 1) AS dup_frac,
       CAST(coalesce(s.n_dup, 0) AS DOUBLE) / greatest(coalesce(s.n_windows, 0), 1) < 0.5 AS keep
FROM (SELECT doc_id AS id FROM documents) i LEFT JOIN s USING (id)
"""


def substring_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-window REMOVAL: rebuild each document's
    text with every non-canonical occurrence of a corpus-duplicated 8-token
    window removed (first occurrence in (doc_id, pos) order is kept). One
    hash-partitioned shuffle of (id, pos, hash); rebuild is row-local."""
    from jsonschema_spark.operators.dedup import substring_dedup

    d = _t(spark, sf_dir, "documents", hot=True)
    return substring_dedup(d, "doc_id", "text", k=8, min_count=2)


ORACLE_SUBSTRING_DEDUP = """
WITH t AS (SELECT doc_id AS id,
       string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents),
w AS (
  SELECT id, i, md5(array_to_string(list_slice(toks, i, i + 7), ' ')) AS wh
  FROM t, unnest(range(1, len(toks) - 8 + 2)) AS r(i)
  WHERE len(toks) >= 8),
f AS (
  SELECT id, i FROM (
    SELECT id, i,
           row_number() OVER (PARTITION BY wh ORDER BY id, i) AS rn,
           count(*) OVER (PARTITION BY wh) AS cnt
    FROM w) WHERE cnt >= 2 AND rn > 1),
tok AS (
  SELECT t.id, t.toks[r.j] AS tk, r.j
  FROM t, unnest(range(1, len(toks) + 1)) AS r(j)),
kept AS (
  SELECT tok.id, tok.tk, tok.j FROM tok
  WHERE NOT EXISTS (SELECT 1 FROM f
                    WHERE f.id = tok.id AND f.i BETWEEN tok.j - 7 AND tok.j)),
ka AS (SELECT id, string_agg(tk, ' ' ORDER BY j) AS ct, count(*) AS nk
       FROM kept GROUP BY id)
SELECT t.id, coalesce(ka.ct, '') AS clean_text,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(len(t.toks) - coalesce(ka.nk, 0) AS BIGINT) AS n_removed
FROM t LEFT JOIN ka USING (id)
"""


def winnow_dup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint duplicate stats (MOSS-style): per doc, how many
    of its winnowed (k=5, w=4) fingerprints occur in >= 2 distinct docs —
    the thinned-exchange alternative to shipping every gram."""
    from jsonschema_spark.operators.dedup import winnow_dup_stats

    d = _t(spark, sf_dir, "documents", hot=True)
    return winnow_dup_stats(d, "doc_id", "text", k=5, w=4, min_docs=2)


ORACLE_WINNOW_DUP = """
WITH t AS (SELECT doc_id AS id,
       string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents),
g AS (
  SELECT id, i AS pos, md5(array_to_string(list_slice(toks, i, i + 4), ' ')) AS gh
  FROM t, unnest(range(1, len(toks) - 5 + 2)) AS r(i)
  WHERE len(toks) >= 5),
r AS (
  SELECT id, pos,
         min(gh) OVER (PARTITION BY id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
         count(*) OVER (PARTITION BY id) AS ng
  FROM g),
fps AS (SELECT DISTINCT id, fp FROM r WHERE pos <= ng - 3),
c AS (SELECT fp, count(DISTINCT id) AS docs_with FROM fps GROUP BY 1),
s AS (SELECT fps.id, count(*) AS n_fps,
             CAST(sum(CAST(c.docs_with >= 2 AS INT)) AS BIGINT) AS n_shared
      FROM fps JOIN c USING (fp) GROUP BY 1)
SELECT i.id, CAST(coalesce(s.n_fps, 0) AS BIGINT) AS n_fps,
       CAST(coalesce(s.n_shared, 0) AS BIGINT) AS n_shared
FROM (SELECT doc_id AS id FROM documents) i LEFT JOIN s USING (id)
"""


def contamination_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination scores: docs with doc_id%10==0 act as the
    frozen eval suite; every other doc is scored by the fraction of its
    word 4-grams that appear in that suite (native near/exact duplicates in
    the synth corpus make the positive set non-trivial)."""
    from jsonschema_spark.operators.decontamination import contamination_scores, ngram_set

    d = _t(spark, sf_dir, "documents")
    bench = ngram_set(d.filter(F.col("doc_id") % 10 == 0), "text", n=4)
    train = d.filter(F.col("doc_id") % 10 != 0)
    return contamination_scores(train, "doc_id", "text", bench, n=4)


ORACLE_CONTAMINATION = """
WITH tok AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents),
g AS (
  SELECT doc_id,
         list_transform(range(1, len(toks) - 2), i -> md5(array_to_string(toks[i:i+3], ' '))) AS grams
  FROM tok),
bench AS (SELECT DISTINCT unnest(grams) AS gh FROM g WHERE doc_id % 10 = 0),
t AS (SELECT doc_id AS id, list_distinct(grams) AS dg FROM g WHERE doc_id % 10 <> 0),
e AS (SELECT id, unnest(dg) AS gh FROM t),
s AS (
  SELECT e.id, count(*) AS n_grams,
         CAST(sum(CAST(b.gh IS NOT NULL AS INT)) AS BIGINT) AS n_cont
  FROM e LEFT JOIN bench b USING (gh) GROUP BY 1)
SELECT t.id, coalesce(s.n_grams, 0) AS n_grams,
       coalesce(s.n_cont, 0) AS n_contaminated,
       CASE WHEN coalesce(s.n_grams, 0) > 0
            THEN CAST(s.n_cont AS DOUBLE) / s.n_grams ELSE 0.0 END AS contamination_frac
FROM t LEFT JOIN s USING (id)
"""


def quality_model_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style model-based quality filter: a hashed bag-of-tokens
    Naive-Bayes log-odds classifier trained from weak labels (lang='en' as
    the high-quality proxy) in ONE aggregation pass, then every doc scored
    by broadcast-joining the ≤2^18-row weight table — the post-heuristic
    "quality classifier" stage of CCNet/GPT-3/LLaMA-style pipelines."""
    from jsonschema_spark.operators.quality_model import (
        fit_nb_quality_model,
        score_quality_model,
    )

    d = _t(spark, sf_dir, "documents").withColumn("pos", F.col("lang") == "en")
    weights, consts = fit_nb_quality_model(d, "doc_id", "text", "pos")
    out = score_quality_model(d, weights, consts, "doc_id", "text")
    return out.select(
        F.col("id").alias("doc_id"),
        F.round("score", 6).alias("score"),
        (F.col("score") > 0).alias("pred_hq"),
    )


ORACLE_QUALITY_MODEL = """
WITH t AS (
  SELECT doc_id, lang = 'en' AS pos,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents),
e AS (
  SELECT doc_id, pos,
         CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % 262144 AS b
  FROM (SELECT doc_id, pos, unnest(toks) AS tok FROM t)),
cnt AS (
  SELECT b, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS cp,
            sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS cn
  FROM e GROUP BY 1),
tot AS (SELECT sum(cp) AS tp, sum(cn) AS tn FROM cnt),
w AS (
  SELECT b, ln((cp + 1.0) / (tp + 262144.0)) - ln((cn + 1.0) / (tn + 262144.0)) AS weight
  FROM cnt, tot),
prior AS (
  SELECT ln(CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
            / sum(CASE WHEN NOT pos THEN 1 ELSE 0 END)) AS bias
  FROM t),
scored AS (SELECT e.doc_id, sum(w.weight) AS s FROM e JOIN w USING (b) GROUP BY 1)
SELECT doc_id, round(bias + s, 6) AS score, (bias + s) > 0 AS pred_hq
FROM scored, prior
"""


def dsir_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (Xie et al. 2023): src0 docs act as the
    target corpus; every doc gets a hashed unigram+bigram log importance
    weight log p̂_target − log q̂_raw, and the top-100 by deterministic
    Gumbel key are selected — the "make the crawl look like the trusted
    corpus" stage of LLaMA/RedPajama-style data pipelines."""
    from jsonschema_spark.operators.dsir import dsir_sample

    d = _t(spark, sf_dir, "documents")
    out = dsir_sample(
        d, None, "doc_id", "text", 100, n_buckets=65536,
        target_flag=F.col("source") == "src0",
    )
    return out.select(
        F.col("id").alias("doc_id"),
        F.round("logw", 6).alias("logw"),
        F.round("key", 6).alias("gumbel_key"),
    )


ORACLE_DSIR_SAMPLE = """
WITH tok AS (
  SELECT doc_id, source,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents),
feat AS (
  SELECT doc_id, source,
         list_concat(
           list_transform(toks, t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % 65536),
           list_transform(range(1, len(toks)), i ->
             CAST(('0x' || substr(md5(toks[i] || ' ' || toks[i+1]), 1, 15)) AS BIGINT) % 65536)
         ) AS fs
  FROM tok),
ev AS (
  SELECT TRUE AS t, unnest(fs) AS b FROM feat WHERE source = 'src0'
  UNION ALL
  SELECT FALSE AS t, unnest(fs) AS b FROM feat),
cnt AS (SELECT b, sum(CASE WHEN t THEN 1 ELSE 0 END) AS ct,
               sum(CASE WHEN NOT t THEN 1 ELSE 0 END) AS cr FROM ev GROUP BY 1),
tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM cnt),
w AS (SELECT b, ln((ct + 1.0) / (tt + 65536.0)) - ln((cr + 1.0) / (tr + 65536.0)) AS lr
      FROM cnt, tot),
de AS (SELECT doc_id AS id, unnest(fs) AS b FROM feat),
sc AS (SELECT de.id, sum(w.lr) AS logw FROM de JOIN w USING (b) GROUP BY 1),
keyed AS (
  SELECT id, logw,
         logw + -ln(-ln((CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15)) AS BIGINT)
                         + 0.5) / POWER(2, 60))) AS k
  FROM sc)
SELECT id AS doc_id, round(logw, 6) AS logw, round(k, 6) AS gumbel_key
FROM keyed ORDER BY k DESC, id ASC LIMIT 100
"""


def perplexity_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality signal: docs with doc_id%5==0 act as the
    trusted reference corpus a smoothed unigram LM is fit on (top-4096
    vocabulary); every other doc is scored by perplexity under that model.
    High-perplexity docs are the drop candidates."""
    from jsonschema_spark.operators.lm_quality import fit_unigram_lm, perplexity_scores

    d = _t(spark, sf_dir, "documents")
    model = fit_unigram_lm(d.filter(F.col("doc_id") % 5 == 0), "text", vocab_size=4096)
    return perplexity_scores(d.filter(F.col("doc_id") % 5 != 0), "doc_id", "text", model)


ORACLE_PERPLEXITY = """
WITH tok AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents),
e AS (SELECT doc_id, unnest(toks) AS token FROM tok),
c AS (SELECT token, count(*) AS cnt FROM e WHERE doc_id % 5 = 0 GROUP BY 1),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
v AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token ASC LIMIT 4096),
k AS (SELECT count(*) AS kept FROM v),
m AS (SELECT v.token, ln((v.cnt + 1.0) / (tot.total + k.kept + 1)) AS logp
      FROM v, tot, k),
o AS (SELECT ln(1.0 / (tot.total + k.kept + 1)) AS oov_logp FROM tot, k),
s AS (
  SELECT e.doc_id AS id, count(*) AS n_tokens,
         CAST(sum(CAST(m.token IS NULL AS INT)) AS BIGINT) AS n_oov,
         sum(coalesce(m.logp, o.oov_logp)) AS ll
  FROM e LEFT JOIN m USING (token), o
  WHERE e.doc_id % 5 <> 0 GROUP BY 1)
SELECT id, n_tokens, n_oov, round(exp(-ll / n_tokens), 6) AS perplexity FROM s
"""


def bigram_perplexity_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KenLM-style order-2 quality signal: a Jelinek-Mercer interpolated
    bigram LM (λ=0.75 on the ML bigram conditional, 0.25 on the smoothed
    unigram) fit on the doc_id%5==0 reference split, scoring every other
    doc. Sharper than the unigram signal on word-order-scrambled text."""
    from jsonschema_spark.operators.lm_quality import (
        bigram_perplexity_scores,
        fit_bigram_lm,
    )

    d = _t(spark, sf_dir, "documents")
    uni, bi = fit_bigram_lm(
        d.filter(F.col("doc_id") % 5 == 0), "text", vocab_size=4096, bigram_size=8192
    )
    return bigram_perplexity_scores(
        d.filter(F.col("doc_id") % 5 != 0), "doc_id", "text", uni, bi, interp=0.75
    )


ORACLE_BIGRAM_PERPLEXITY = """
WITH tok AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents),
e AS (SELECT doc_id, unnest(toks) AS token FROM tok),
c AS (SELECT token, count(*) AS cnt FROM e WHERE doc_id % 5 = 0 GROUP BY 1),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
v AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token ASC LIMIT 4096),
k AS (SELECT count(*) AS kept FROM v),
m AS (SELECT v.token, ln((v.cnt + 1.0) / (tot.total + k.kept + 1)) AS logp
      FROM v, tot, k),
o AS (SELECT ln(1.0 / (tot.total + k.kept + 1)) AS oov_logp FROM tot, k),
bpairs AS (
  SELECT doc_id, unnest([{'w1': toks[i], 'w2': toks[i+1]} FOR i IN range(1, len(toks))]) AS p
  FROM tok),
bc AS (SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS c12
       FROM bpairs WHERE doc_id % 5 = 0 GROUP BY 1, 2),
ctx AS (SELECT w1, sum(c12) AS c1 FROM bc GROUP BY 1),
bt AS (SELECT w1, w2, c12 FROM bc ORDER BY c12 DESC, w1 ASC, w2 ASC LIMIT 8192),
bm AS (SELECT bt.w1, bt.w2, CAST(bt.c12 AS DOUBLE) / ctx.c1 AS pml
       FROM bt JOIN ctx USING (w1)),
r AS (
  SELECT doc_id, CAST(NULL AS VARCHAR) AS w1, toks[1] AS w2
  FROM tok WHERE doc_id % 5 <> 0
  UNION ALL
  SELECT doc_id, p.w1, p.w2 FROM bpairs WHERE doc_id % 5 <> 0),
s AS (
  SELECT r.doc_id AS id, count(*) AS n_tokens,
         CAST(sum(CAST(bm.pml IS NOT NULL AS INT)) AS BIGINT) AS n_hits,
         sum(CASE WHEN r.w1 IS NULL THEN ln(exp(coalesce(m.logp, o.oov_logp)))
                  ELSE ln(0.75 * coalesce(bm.pml, 0.0)
                          + 0.25 * exp(coalesce(m.logp, o.oov_logp))) END) AS ll
  FROM r LEFT JOIN bm ON bm.w1 = r.w1 AND bm.w2 = r.w2
         LEFT JOIN m ON m.token = r.w2, o
  GROUP BY 1)
SELECT id, n_tokens, n_hits, round(exp(-ll / n_tokens), 6) AS perplexity FROM s
"""


def ppl_buckets_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's actual selection step: per-LANGUAGE perplexity terciles
    (head/middle/tail) over the scored crawl docs — head is kept outright,
    tail is the drop candidate pool. Exact ntile cut with id tiebreak; the
    sketch-threshold scale path is pinned against this in
    tests/test_sampling.py."""
    from jsonschema_spark.operators.lm_quality import fit_unigram_lm, perplexity_scores
    from jsonschema_spark.operators.sampling import quantile_buckets

    d = _t(spark, sf_dir, "documents")
    model = fit_unigram_lm(d.filter(F.col("doc_id") % 5 == 0), "text", vocab_size=4096)
    scores = perplexity_scores(d.filter(F.col("doc_id") % 5 != 0), "doc_id", "text", model)
    scored = scores.join(d.select(F.col("doc_id").alias("id"), "lang"), "id")
    out = quantile_buckets(
        scored,
        "perplexity",
        "lang",
        n_buckets=3,
        labels=["head", "middle", "tail"],
        id_col="id",
    )
    return out.select(F.col("id").alias("doc_id"), "lang", "perplexity", "bucket")


ORACLE_PPL_BUCKETS = """
WITH tok AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents),
e AS (SELECT doc_id, unnest(toks) AS token FROM tok),
c AS (SELECT token, count(*) AS cnt FROM e WHERE doc_id % 5 = 0 GROUP BY 1),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
v AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token ASC LIMIT 4096),
k AS (SELECT count(*) AS kept FROM v),
m AS (SELECT v.token, ln((v.cnt + 1.0) / (tot.total + k.kept + 1)) AS logp
      FROM v, tot, k),
o AS (SELECT ln(1.0 / (tot.total + k.kept + 1)) AS oov_logp FROM tot, k),
s AS (
  SELECT e.doc_id AS id, count(*) AS n_tokens,
         sum(coalesce(m.logp, o.oov_logp)) AS ll
  FROM e LEFT JOIN m USING (token), o
  WHERE e.doc_id % 5 <> 0 GROUP BY 1),
scored AS (
  SELECT s.id, d.lang, round(exp(-s.ll / s.n_tokens), 6) AS perplexity
  FROM s JOIN documents d ON d.doc_id = s.id)
SELECT id AS doc_id, lang, perplexity,
       (['head', 'middle', 'tail'])[ntile(3) OVER (PARTITION BY lang ORDER BY perplexity ASC, id ASC)] AS bucket
FROM scored
"""


def histogram_price_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bin equal-width histogram of l_extendedprice (empty bins kept)."""
    from jsonschema_spark.operators.profile import histogram

    out = histogram(_t(spark, sf_dir, "lineitem"), "l_extendedprice", n_bins=16)
    return out.select(
        "bin", F.round("bin_lo", 6).alias("bin_lo"), F.round("bin_hi", 6).alias("bin_hi"), "cnt"
    )


ORACLE_HISTOGRAM_PRICE = """
WITH b AS (SELECT CAST(min(l_extendedprice) AS DOUBLE) AS lo,
                  CAST(max(l_extendedprice) AS DOUBLE) AS hi FROM lineitem),
binned AS (
  SELECT CAST(least(greatest(floor((CAST(l_extendedprice AS DOUBLE) - b.lo) / ((b.hi - b.lo) / 16)), 0), 15) AS INT) AS bin
  FROM lineitem, b WHERE l_extendedprice IS NOT NULL),
c AS (SELECT bin, count(*) AS cnt FROM binned GROUP BY 1)
SELECT r.range AS bin,
       round(b.lo + r.range * ((b.hi - b.lo) / 16), 6) AS bin_lo,
       round(b.lo + (r.range + 1) * ((b.hi - b.lo) / 16), 6) AS bin_hi,
       coalesce(c.cnt, 0) AS cnt
FROM range(16) r CROSS JOIN b LEFT JOIN c ON c.bin = r.range
"""


def quantiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact type-7 quantiles, long form (oracle: DuckDB quantile_cont).

    Columns are O(1)-magnitude so the 9-dp value compare is far below
    double noise; approx_percentile (the 100 TB path) is pinned against
    this exact estimator in tests/test_profile.py instead."""
    from jsonschema_spark.operators.profile import quantiles

    return quantiles(
        _t(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_discount", "l_tax"],
        [0.25, 0.5, 0.75, 0.95, 0.99],
    )


def _oracle_quantiles_lineitem() -> str:
    cols = ["l_quantity", "l_discount", "l_tax"]
    probs = [0.25, 0.5, 0.75, 0.95, 0.99]
    selects = [
        f"SELECT '{c}' AS column, CAST({p!r} AS DOUBLE) AS prob,"
        f" quantile_cont(CAST({c} AS DOUBLE), {p!r}) AS value FROM lineitem"
        for c in cols
        for p in probs
    ]
    return "\nUNION ALL\n".join(selects)


def heavy_hitters_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most frequent p_type values, deterministic tie-break."""
    from jsonschema_spark.operators.profile import heavy_hitters

    return heavy_hitters(_t(spark, sf_dir, "part"), "p_type", k=10)


ORACLE_HEAVY_HITTERS = """
WITH c AS (
  SELECT CAST(p_type AS VARCHAR) AS value, count(*) AS cnt
  FROM part WHERE p_type IS NOT NULL GROUP BY 1),
r AS (
  SELECT value, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, value ASC) AS INT) AS rank
  FROM c)
SELECT value, cnt, rank FROM r WHERE rank <= 10
"""


def dup_keys_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jsonschema_spark.operators.uniqueness import duplicate_keys

    return duplicate_keys(_t(spark, sf_dir, "lineitem"), "l_orderkey")


ORACLE_DUP_KEYS = """
SELECT l_orderkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1 HAVING count(*) > 1
"""


def referential_events_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jsonschema_spark.operators.referential import referential_violations

    e = _t(spark, sf_dir, "events").select("user_id").distinct()
    s = _t(spark, sf_dir, "supplier")
    return referential_violations(e, "user_id", s, "s_suppkey", broadcast_dim=True)


ORACLE_REFERENTIAL_DANGLING = """
SELECT DISTINCT user_id FROM events
WHERE user_id NOT IN (SELECT s_suppkey FROM supplier)
"""


def referential_orders_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jsonschema_spark.operators.referential import referential_check

    return referential_check(
        _t(spark, sf_dir, "orders"), "o_custkey", _t(spark, sf_dir, "customer"), "c_custkey"
    )


ORACLE_REFERENTIAL_CLEAN = """
SELECT 'referential:o_custkey' AS check_name,
       count(*) = 0 AS passed,
       CAST(count(*) AS DOUBLE) AS statistic,
       CAST(0.0 AS DOUBLE) AS threshold
FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
"""


def cardinality_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.countDistinct("o_custkey").alias("distinct_custkey"),
        F.countDistinct("o_orderstatus").alias("distinct_status"),
        F.countDistinct("o_orderpriority").alias("distinct_priority"),
    )


ORACLE_CARDINALITY = """
SELECT count(DISTINCT o_custkey) AS distinct_custkey,
       count(DISTINCT o_orderstatus) AS distinct_status,
       count(DISTINCT o_orderpriority) AS distinct_priority
FROM orders
"""


def ks_click_vs_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS drift in the DEFAULT (bucketed, scale-safe) mode — the windowed
    relation is bounded at 1024 rows however large events gets."""
    from jsonschema_spark.operators.drift import ks_statistic

    e = _t(spark, sf_dir, "events")
    out = ks_statistic(e, "value", "event_type", "click", "view")
    return out.select(F.round("ks", 9).alias("ks"))


ORACLE_KS = """
WITH d AS (
  SELECT CAST(value AS DOUBLE) AS v, event_type AS g
  FROM events WHERE event_type IN ('click','view') AND value IS NOT NULL),
bounds AS (SELECT min(v) AS lo, max(v) AS hi FROM d),
bucketed AS (
  SELECT least(1023, floor((v - lo) / ((hi - lo) / 1024 + 1e-300))) AS v, g
  FROM d, bounds),
per_value AS (
  SELECT v,
         sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS cb
  FROM bucketed GROUP BY 1),
ecdf AS (
  SELECT sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
         sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
  FROM per_value),
tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM per_value)
SELECT round(max(abs(cum_a / na - cum_b / nb)), 9) AS ks FROM ecdf, tot
"""


def psi_lang_src(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jsonschema_spark.operators.drift import psi

    d = _t(spark, sf_dir, "documents").withColumn(
        "grp",
        F.when(F.regexp_extract("source", r"src(\d+)", 1).cast("int") < 10, "a").otherwise("b"),
    )
    return psi(d, "lang", "grp", "a", "b").select(F.round("psi", 6).alias("psi"))


ORACLE_PSI = """
WITH base AS (
  SELECT lang AS cat,
         CASE WHEN CAST(regexp_extract(source, 'src(\\d+)', 1) AS INTEGER) < 10 THEN 'a' ELSE 'b' END AS g
  FROM documents),
freqs AS (
  SELECT cat, sum(CASE WHEN g='a' THEN 1 ELSE 0 END) AS ca,
              sum(CASE WHEN g='b' THEN 1 ELSE 0 END) AS cb
  FROM base GROUP BY 1),
tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM freqs)
SELECT round(sum((p - q) * ln(p / q)), 6) AS psi FROM (
  SELECT greatest(ca / na, 1e-6) AS p, greatest(cb / nb, 1e-6) AS q FROM freqs, tot)
"""



def ks_span_length_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule drift check: KS on the SPAN-LENGTH distribution (spans per
    interleaved document) between two document cohorts. Span length is one
    map-side-combining count per doc -- the spans array itself is never
    materialized for this check, so the plan is a groupBy + the bounded
    1024-bucket ECDF window at any corpus size."""
    from jsonschema_spark.operators.drift import ks_statistic

    e = _t(spark, sf_dir, "events")
    lens = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("span_len"))
    d = lens.withColumn(
        "grp", F.when(F.col("user_id") % 2 == 0, "a").otherwise("b")
    )
    out = ks_statistic(d, "span_len", "grp", "a", "b")
    return out.select(F.round("ks", 9).alias("ks"))


ORACLE_KS_SPAN_LEN = """
WITH lens AS (
  SELECT user_id, CAST(count(*) AS DOUBLE) AS v FROM events GROUP BY 1),
d AS (
  SELECT v, CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS g FROM lens),
bounds AS (SELECT min(v) AS lo, max(v) AS hi FROM d),
bucketed AS (
  SELECT least(1023, floor((v - lo) / ((hi - lo) / 1024 + 1e-300))) AS v, g
  FROM d, bounds),
per_value AS (
  SELECT v,
         sum(CASE WHEN g = 'a' THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN g = 'b' THEN 1 ELSE 0 END) AS cb
  FROM bucketed GROUP BY 1),
ecdf AS (
  SELECT sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
         sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
  FROM per_value),
tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM per_value)
SELECT round(max(abs(cum_a / na - cum_b / nb)), 9) AS ks FROM ecdf, tot
"""


def psi_span_kind_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule drift check: PSI on the span KIND frequency table
    (text vs media, the interleaved-doc mapping of event_type) between two
    document cohorts. One map-side-combining groupBy to a 2-row frequency
    relation; everything downstream is driver-scale."""
    from jsonschema_spark.operators.drift import psi

    e = _t(spark, sf_dir, "events").select(
        F.when(F.col("event_type").isin("click", "view"), F.lit("text"))
        .otherwise(F.lit("media"))
        .alias("kind"),
        F.when(F.col("user_id") % 2 == 0, F.lit("a")).otherwise(F.lit("b")).alias("grp"),
    )
    return psi(e, "kind", "grp", "a", "b").select(F.round("psi", 6).alias("psi"))


ORACLE_PSI_SPAN_KIND = """
WITH base AS (
  SELECT CASE WHEN event_type IN ('click','view') THEN 'text' ELSE 'media' END AS cat,
         CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS g
  FROM events),
freqs AS (
  SELECT cat, sum(CASE WHEN g='a' THEN 1 ELSE 0 END) AS ca,
              sum(CASE WHEN g='b' THEN 1 ELSE 0 END) AS cb
  FROM base GROUP BY 1),
tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM freqs)
SELECT round(sum((p - q) * ln(p / q)), 6) AS psi FROM (
  SELECT greatest(ca / na, 1e-6) AS p, greatest(cb / nb, 1e-6) AS q FROM freqs, tot)
"""


def chi2_event_type_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square homogeneity test on the event_type (kind) frequency table
    between two user cohorts — the kind-frequency drift check with a known
    null distribution (alert on p-value instead of a PSI rule of thumb)."""
    from jsonschema_spark.operators.drift import chi2_statistic

    e = _t(spark, sf_dir, "events").withColumn(
        "grp", F.when(F.col("user_id") % 2 == 0, "a").otherwise("b")
    )
    out = chi2_statistic(e, "event_type", "grp", "a", "b")
    return out.select(F.round("chi2", 6).alias("chi2"), "dof")


ORACLE_CHI2 = """
WITH base AS (
  SELECT event_type AS cat,
         CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS g
  FROM events),
freqs AS (
  SELECT cat, sum(CASE WHEN g='a' THEN 1 ELSE 0 END) AS ca,
              sum(CASE WHEN g='b' THEN 1 ELSE 0 END) AS cb
  FROM base GROUP BY 1),
tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM freqs)
SELECT round(sum(
         pow(ca - (ca + cb) * na / (na + nb), 2) / ((ca + cb) * na / (na + nb))
       + pow(cb - (ca + cb) * nb / (na + nb), 2) / ((ca + cb) * nb / (na + nb))
       ), 6) AS chi2,
       count(*) - 1 AS dof
FROM freqs, tot
"""


def js_lang_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence of the language distribution between the
    same source cohorts as `psi_lang_src` — symmetric and bounded (ln 2)
    where PSI blows up under disjoint support (brand-new categories)."""
    from jsonschema_spark.operators.drift import js_divergence

    d = _t(spark, sf_dir, "documents").withColumn(
        "grp",
        F.when(F.regexp_extract("source", r"src(\d+)", 1).cast("int") < 10, "a").otherwise("b"),
    )
    return js_divergence(d, "lang", "grp", "a", "b").select(F.round("js", 9).alias("js"))


ORACLE_JS = """
WITH base AS (
  SELECT lang AS cat,
         CASE WHEN CAST(regexp_extract(source, 'src(\\d+)', 1) AS INTEGER) < 10 THEN 'a' ELSE 'b' END AS g
  FROM documents),
freqs AS (
  SELECT cat, sum(CASE WHEN g='a' THEN 1 ELSE 0 END) AS ca,
              sum(CASE WHEN g='b' THEN 1 ELSE 0 END) AS cb
  FROM base GROUP BY 1),
tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM freqs)
SELECT round(sum(0.5 * p * ln(p / ((p + q) / 2)) + 0.5 * q * ln(q / ((p + q) / 2))), 9) AS js
FROM (SELECT greatest(ca / na, 1e-6) AS p, greatest(cb / nb, 1e-6) AS q FROM freqs, tot)
"""


def wasserstein_value_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed 1-Wasserstein distance between click and view value
    distributions — integrates the CDF gap in the value's own units where
    KS reports only the worst single gap."""
    from jsonschema_spark.operators.drift import wasserstein_1

    e = _t(spark, sf_dir, "events")
    out = wasserstein_1(e, "value", "event_type", "click", "view")
    return out.select(F.round("w1", 6).alias("w1"))


ORACLE_W1 = """
WITH d AS (
  SELECT CAST(value AS DOUBLE) AS v, event_type AS g
  FROM events WHERE event_type IN ('click','view') AND value IS NOT NULL),
bounds AS (SELECT min(v) AS lo, max(v) AS hi FROM d),
bucketed AS (
  SELECT least(1023, floor((v - lo) / ((hi - lo) / 1024 + 1e-300))) AS v, g,
         (hi - lo) / 1024 AS w
  FROM d, bounds),
per_value AS (
  SELECT v,
         sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END) AS cb,
         first(w) AS w
  FROM bucketed GROUP BY 1),
ecdf AS (
  SELECT sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
         sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b,
         coalesce(lead(v) OVER (ORDER BY v), v) - v AS run,
         w
  FROM per_value),
tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM per_value)
SELECT round(sum(abs(cum_a / na - cum_b / nb) * run * w), 6) AS w1 FROM ecdf, tot
"""


