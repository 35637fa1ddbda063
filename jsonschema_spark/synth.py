"""Deterministic synthetic interleaved-docs tables (FIXTURES.md §1-3).

Generates the north-rule input shape — ``doc_id:string``,
``spans:array<struct<kind,text,media_ref,offset>>`` — plus ``media_catalog``
and the clean ``docs_reference`` twin, with seeded injected defects:
~1% duplicated doc_ids, ~1% dangling media_refs, ~2% constraint violations,
and a skew tail of media-heavy documents (up to ~100× median span count) to
exercise salted repartition. No external data; same seed ⇒ same bytes.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = ["SynthConfig", "make_docs_pdf", "make_docs", "make_media_catalog", "DOCS_DDL"]

DOCS_DDL = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)
MEDIA_DDL = "media_ref string, media_type string, bytes bigint"

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray yankee zulu"
).split()


@dataclass
class SynthConfig:
    n_docs: int = 10_000
    seed: int = 42
    dup_doc_id_frac: float = 0.01
    dangling_media_frac: float = 0.01
    violation_frac: float = 0.02
    skew_frac: float = 0.002  # fraction of docs with ~100× median spans
    median_spans: int = 6
    n_media: int = 2_000


def _doc_id(rng: np.random.Generator) -> str:
    return str(uuid.UUID(bytes=rng.bytes(16), version=4))


def make_media_catalog_pdf(cfg: SynthConfig) -> pd.DataFrame:
    rng = np.random.default_rng(cfg.seed + 1)
    refs = [f"media://{i:08x}" for i in range(cfg.n_media)]
    types = rng.choice(["image", "audio", "video"], size=cfg.n_media, p=[0.7, 0.2, 0.1])
    sizes = rng.integers(1_000, 50_000_000, size=cfg.n_media)
    return pd.DataFrame({"media_ref": refs, "media_type": types, "bytes": sizes})


def make_docs_pdf(cfg: SynthConfig) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (docs, docs_reference) pandas frames with identical doc order.

    docs_reference is the clean twin (violations NOT injected) used as the
    per-row span-sequence oracle (north rule: span-sequence equality on
    (kind, text, media_ref, order))."""
    rng = np.random.default_rng(cfg.seed)
    rows = []
    ref_rows = []

    n = cfg.n_docs
    doc_ids = [_doc_id(rng) for _ in range(n)]
    # ~1% duplicate doc_ids: overwrite with an earlier id
    n_dup = int(n * cfg.dup_doc_id_frac)
    if n_dup:
        dup_targets = rng.choice(np.arange(1, n), size=n_dup, replace=False)
        for t in dup_targets:
            doc_ids[t] = doc_ids[rng.integers(0, t)]

    skew_cut = int(n * cfg.skew_frac)
    for i in range(n):
        if i < skew_cut:
            n_spans = int(rng.integers(cfg.median_spans * 50, cfg.median_spans * 100))
        else:
            n_spans = max(1, int(rng.poisson(cfg.median_spans)))
        kinds = rng.random(n_spans) < 0.75  # True → text span
        offset = 0
        spans = []
        clean_spans = []
        for j in range(n_spans):
            if kinds[j]:
                nw = int(rng.integers(2, 12))
                text = " ".join(_WORDS[w] for w in rng.integers(0, len(_WORDS), nw))
                span = {"kind": "text", "text": text, "media_ref": None, "offset": offset}
                offset += len(text) + 1
            else:
                mid = int(rng.integers(0, cfg.n_media))
                ref = f"media://{mid:08x}"
                if rng.random() < cfg.dangling_media_frac:
                    ref = f"media://ff{rng.integers(0, 2**24):06x}"  # dangling
                span = {"kind": "media", "text": None, "media_ref": ref, "offset": offset}
                offset += 1
            clean_spans.append(dict(span))
            # inject constraint violations on the dirty copy
            if rng.random() < cfg.violation_frac:
                mode = int(rng.integers(0, 4))
                span = dict(span)
                if mode == 0:
                    span["kind"] = "unknown"  # bad enum
                elif mode == 1 and span["kind"] == "text":
                    span["text"] = ""  # empty text
                elif mode == 2:
                    span["offset"] = -1  # negative offset
                else:
                    span["kind"] = None  # null required field
            spans.append(span)
        rows.append({"doc_id": doc_ids[i], "spans": spans})
        ref_rows.append({"doc_id": doc_ids[i], "spans": clean_spans})

    return pd.DataFrame(rows), pd.DataFrame(ref_rows)


def make_docs_distributed(
    spark: SparkSession, cfg: SynthConfig, *, n_chunks: int = 64
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(docs, docs_reference, media_catalog) generated ON THE EXECUTORS via
    mapInPandas — chunk i uses seed (cfg.seed*1000 + i), so the same config
    always produces the same bytes, and docs/reference twins stay aligned
    because both derive from the same per-chunk RNG stream. Use this above
    ~10^5 docs; driver-side make_docs doesn't scale."""
    from dataclasses import replace

    per_chunk = cfg.n_docs // n_chunks

    def _gen(which: int):
        def gen(batches):
            for pdf in batches:
                for i in pdf["id"]:
                    c = replace(cfg, n_docs=per_chunk, seed=cfg.seed * 1000 + int(i))
                    docs_pdf, ref_pdf = make_docs_pdf(c)
                    yield docs_pdf if which == 0 else ref_pdf

        return gen

    chunks = spark.range(n_chunks).repartition(n_chunks)
    docs = chunks.mapInPandas(_gen(0), schema=DOCS_DDL)
    ref = chunks.mapInPandas(_gen(1), schema=DOCS_DDL)
    media = spark.createDataFrame(make_media_catalog_pdf(cfg), schema=MEDIA_DDL)
    return docs, ref, media


def make_docs(spark: SparkSession, cfg: SynthConfig | None = None) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(docs, docs_reference, media_catalog) Spark DataFrames."""
    cfg = cfg or SynthConfig()
    docs_pdf, ref_pdf = make_docs_pdf(cfg)
    docs = spark.createDataFrame(docs_pdf, schema=DOCS_DDL)
    ref = spark.createDataFrame(ref_pdf, schema=DOCS_DDL)
    media = spark.createDataFrame(make_media_catalog_pdf(cfg), schema=MEDIA_DDL)
    return docs, ref, media


# The constraint schema the engine validates docs against (SURVEY §7 phase 0).
DOCS_SCHEMA = {
    "type": "object",
    "required": ["doc_id", "spans"],
    "properties": {
        "doc_id": {
            "type": "string",
            "format": "uuid",
        },
        "spans": {
            "type": "array",
            "minItems": 1,
            "items": {
                "type": "object",
                "required": ["kind", "offset"],
                "properties": {
                    "kind": {"enum": ["text", "media"]},
                    "text": {"type": "string"},
                    "media_ref": {"type": "string", "pattern": "^media://[0-9a-f]+$"},
                    "offset": {"type": "integer", "minimum": 0},
                },
                "allOf": [
                    {
                        "if": {"properties": {"kind": {"const": "text"}}, "required": ["kind"]},
                        "then": {"required": ["text"], "properties": {"text": {"minLength": 1}}},
                    },
                    {
                        "if": {"properties": {"kind": {"const": "media"}}, "required": ["kind"]},
                        "then": {"required": ["media_ref"]},
                    },
                ],
            },
        },
    },
}
