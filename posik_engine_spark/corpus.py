"""Deterministic synthetic corpora (FIXTURES.md F1/F2) + adapters.

Two corpus sources:
- ``synthetic_docs``: seeded generator in the BASELINE.json input_hint
  shape (repo, path, commit, lang, content) with the tokenizer edge
  cases from the reference unit tests baked in (hot terms, camelCase,
  digits, hyphens, punctuation-only, empty files).
- ``docs_from_documents``: adapter that reshapes the driver-provided
  ``documents`` parquet (doc_id, text, lang, source, n_chars) into the
  docs shape so the same engine runs on /root/testdata.
"""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_COLUMNS = ["repo", "path", "commit", "lang", "content"]

_SNAKE_WORDS = [
    "parse", "http", "request", "response", "buffer", "stream", "index",
    "token", "merge", "block", "score", "query", "shard", "delta", "varint",
    "posting", "lemma", "handler", "config", "writer", "reader", "cache",
]
_CAMEL_IDENTS = [
    "parseHttpRequest", "buildIndexBlock", "mergeSortedRuns", "scoreTopK",
    "readVarintDelta", "encodePostingList", "fetchRobotsTxt", "splitCamelCase",
]
_KEYWORDS_HOT = ["def", "import"]  # hot terms for skew tests (FIXTURES F1)
_HYPHENATED = ["top-k", "block-max", "read-only", "varint-encoded"]
_NL_WORDS = ["simple", "input", "string", "really", "window", "search"]
_LANGS = ["python", "java", "text"]


def synthetic_docs_pdf(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Seeded docs table as pandas (driver-side; cheap up to ~10^5 rows).

    Shape per FIXTURES.md F1: ~10 repos with repo-00 holding ~50% of
    rows; ~10% of paths appear under a second commit; a few empty and
    punctuation-only files.
    """
    rng = random.Random(seed)
    rows: list[dict] = []
    for i in range(n_docs):
        repo = "repo-00" if rng.random() < 0.5 else f"repo-{rng.randint(1, 9):02d}"
        path = f"src/pkg{i % 37}/mod_{i}.py"
        commit = f"{rng.getrandbits(32):08x}"
        lang = _LANGS[rng.randrange(len(_LANGS))]
        r = rng.random()
        if r < 0.01:
            content = ""  # empty file edge case
        elif r < 0.02:
            content = "!!! ... ### ;;; ,,,"  # punctuation-only
        else:
            n_lines = rng.randint(3, 12)
            lines = []
            for _ in range(n_lines):
                parts = []
                if rng.random() < 0.9:
                    parts.append(rng.choice(_KEYWORDS_HOT))  # hot term ~90% of docs
                parts.append("_".join(rng.sample(_SNAKE_WORDS, rng.randint(1, 3))))
                if rng.random() < 0.5:
                    parts.append(rng.choice(_CAMEL_IDENTS))
                if rng.random() < 0.3:
                    parts.append(str(rng.randint(0, 9999)))
                if rng.random() < 0.2:
                    parts.append(rng.choice(_HYPHENATED))
                if rng.random() < 0.3:
                    parts.append(rng.choice(_NL_WORDS))
                if rng.random() < 0.2:
                    parts.append("the quick and simple")  # stop-word material
                lines.append(" ".join(parts))
            content = "\n".join(lines)
        rows.append(
            {"repo": repo, "path": path, "commit": commit, "lang": lang, "content": content}
        )
        if rng.random() < 0.10:  # second commit of the same path (incremental reindex)
            rows.append(
                {
                    "repo": repo,
                    "path": path,
                    "commit": f"{rng.getrandbits(32):08x}",
                    "lang": lang,
                    "content": content + "\nupdated buffer handler 42",
                }
            )
    return pd.DataFrame(rows, columns=DOCS_COLUMNS)


def synthetic_docs(spark: SparkSession, n_docs: int, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(synthetic_docs_pdf(n_docs, seed))


def zipf_docs_pdf(
    n_docs: int = 20_000, n_repos: int = 20, seed: int = 7,
    topical: bool = False,
) -> pd.DataFrame:
    """Zipf-skewed corpus for WAND-pruning effectiveness scenarios.

    Term mix per doc: ``common0`` in every doc, ``common1..7`` with
    probability 1/(c+1), a Zipf(1.1) tail of ``w<rank>`` filler, and —
    the pruning target — one ``rare<r>`` marker in the FIRST 10 docs of
    each repo. Because posting blocks store dense per-shard ordinals
    ordered by (repo, path), a rare term's candidates occupy narrow
    ordinal ranges, so an AND query pairing ``rare<r>`` with a common
    term only decodes the common term's few overlapping blocks — the
    realistic rare∧common workload shape the uniform suite in
    BENCH_QUERIES cannot produce (its every term matches everywhere).

    ``topical=True`` additionally gives repos with ``r % 10 in
    {1, 2, 3}`` a FOCUS term ``common{r%10}`` their docs repeat 3-12
    times — the "repo about a topic" tf shape real code corpora have
    (a JSON library says 'json' hundreds of times; everyone else says
    it once). Focus docs cluster in ordinal ranges (ordinals are
    (repo, path)-ordered), so their blocks carry high max-tf bounds
    while the ~90% off-topic blocks bound at tf=1 — the variance the
    descending-ub early-termination cut (WAND lever 3) needs on
    common∧common AND queries, where block-RANGE pruning cannot help
    (every block overlaps candidates). One-in-ten keeps the high-ub
    prefix SHORT relative to the AND-survivor set; boosting most
    repos would let the geometric scoring-chunk schedule reach the
    whole set before the cut can fire at test/bench scale. The flag
    leaves the rng stream of the default corpus untouched."""
    rng = random.Random(seed)
    rows: list[dict] = []
    per_repo = max(1, n_docs // n_repos)
    for r in range(n_repos):
        for j in range(per_repo):
            words = ["common0"]
            for c in range(1, 8):
                if rng.random() < 1.0 / (c + 1):
                    words.append(f"common{c}")
            for _ in range(30):
                rank = min(int(rng.paretovariate(1.1)), 5000)
                words.append(f"w{rank}")
            if j < 10:
                words.append(f"rare{r}")
            if topical and r % 10 in (1, 2, 3):
                words.extend([f"common{r % 10}"] * rng.randint(3, 12))
            rng.shuffle(words)
            rows.append(
                {
                    "repo": f"repo-{r:03d}",
                    "path": f"src/f{j:05d}.py",
                    "commit": "c1",
                    "lang": "text",
                    "content": " ".join(words),
                }
            )
    return pd.DataFrame(rows, columns=DOCS_COLUMNS)


def zipf_docs(
    spark: SparkSession, n_docs: int = 20_000, n_repos: int = 20, seed: int = 7,
    topical: bool = False,
) -> DataFrame:
    return spark.createDataFrame(zipf_docs_pdf(n_docs, n_repos, seed, topical))


def clustered_embeddings_pdf(
    n_vectors: int = 2_000,
    dim: int = 64,
    n_clusters: int = 32,
    sigma: float = 0.2,
    seed: int = 5,
) -> pd.DataFrame:
    """Gaussian-mixture embeddings — the cluster structure real corpora
    have (per-repo/topic embedding neighborhoods) and the testdata's
    near-random vectors lack, which is IVF's HARDEST case (round-4
    verdict item 5: the bench recall curve measured on near-random
    embeddings says little about a deployment). Cluster centers are
    unit-normalized N(0,1)^dim draws; each vector is its cluster's
    center + N(0, sigma) noise, round-robin over clusters so every
    cluster has ~n/k members. The default sigma=0.2 against unit centers keeps
    cosine neighbors overwhelmingly within-cluster (the per-topic
    neighborhood shape) while leaving real overlap between nearby
    centers. Deterministic via a seeded numpy Generator; float32 like
    the testdata embeddings."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    cluster = np.arange(n_vectors) % n_clusters
    vecs = centers[cluster] + sigma * rng.standard_normal((n_vectors, dim))
    return pd.DataFrame(
        {
            "vec_id": np.arange(n_vectors, dtype=np.int64),
            "embedding": [row.astype(np.float32).tolist() for row in vecs],
            "cluster": cluster.astype(np.int64),
        }
    )


def clustered_embeddings(
    spark: SparkSession,
    n_vectors: int = 2_000,
    dim: int = 64,
    n_clusters: int = 32,
    sigma: float = 0.2,
    seed: int = 5,
) -> DataFrame:
    return spark.createDataFrame(
        clustered_embeddings_pdf(n_vectors, dim, n_clusters, sigma, seed),
        "vec_id long, embedding array<float>, cluster long",
    )


def docs_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's documents parquet into the docs shape
    (delegates to the single identity-mapping rule in
    jobs/build_index.adapt_source: repo=source, path=doc/<doc_id>,
    commit='00000000' — two copies of the rule would let doc_ids
    diverge between the API path and the spark-submit path)."""
    from posik_engine_spark.jobs.build_index import adapt_source

    return adapt_source(spark, f"{sf_dir}/documents.parquet")


# Reference query set (FIXTURES.md F2): mix of rare/hot/AND/relaxation/
# stop-only/digits/identifier queries over the synthetic vocabulary.
REFERENCE_QUERIES: list[dict] = [
    {"query_id": 1, "query": "varint", "repo_filter": None, "offset": 0, "limit": 20},
    {"query_id": 2, "query": "def", "repo_filter": None, "offset": 0, "limit": 20},
    {"query_id": 3, "query": "posting merge", "repo_filter": None, "offset": 0, "limit": 20},
    {"query_id": 4, "query": "parseHttpRequest", "repo_filter": None, "offset": 0, "limit": 20},
    {"query_id": 5, "query": "block-max score", "repo_filter": None, "offset": 0, "limit": 20},
    {"query_id": 6, "query": "index token merge block", "repo_filter": None, "offset": 0, "limit": 20},
    {"query_id": 7, "query": "42", "repo_filter": None, "offset": 0, "limit": 20},
    {"query_id": 8, "query": "simple window search", "repo_filter": "repo-00", "offset": 0, "limit": 20},
    {"query_id": 9, "query": "buffer handler", "repo_filter": None, "offset": 10, "limit": 10},
    {"query_id": 10, "query": "the and of", "repo_filter": None, "offset": 0, "limit": 20},  # stop-only -> error
    {"query_id": 11, "query": "varint zzznonexistent", "repo_filter": None, "offset": 0, "limit": 20},  # relaxation
    {"query_id": 12, "query": "read-only cache", "repo_filter": None, "offset": 0, "limit": 20},
]
