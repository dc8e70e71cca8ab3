"""Deterministic synthetic source-code corpus (FIXTURES.md §1-2).

Generates the Iceberg-shaped input table the north rule targets:
``(repo, path, commit, lang, content)`` — seeded, reproducible, with the
properties the engine must handle at 100 TB scale:

* zipf-distributed identifier pool (~5,000 identifiers, camelCase and
  snake_case mixed) → realistic vocab skew,
* stop-term-heavy boilerplate (``license``, ``import``, ``def``, ``the``)
  concentrated in a handful of keys → exercises salted-key skew handling,
* stable primary key (repo, path, commit); ``doc_id`` assigned downstream
  via a deterministic window, never ``monotonically_increasing_id``.

Generation is pure Python + a seeded RNG; the driver-side parquet write
happens once per (n_files, seed) and is cached under ``cache_dir``.
"""

from __future__ import annotations

import hashlib
import os
import random
from typing import Dict, List, Tuple

LANGS = ["python", "java", "go", "js", "rust", "c"]
LANG_WEIGHTS = [0.35, 0.20, 0.15, 0.15, 0.10, 0.05]
LANG_EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "rust": "rs", "c": "c"}

# stop-term-heavy boilerplate per FIXTURES.md — these dominate the posting
# distribution and are what the skew salting must survive.
STOP_TERMS = ["the", "license", "import", "def", "return", "public", "static",
              "func", "const", "let", "fn", "void", "copyright", "under",
              "apache", "this", "file", "is", "distributed"]

_WORD_STEMS = ["user", "name", "index", "query", "token", "parse", "build",
               "merge", "scan", "read", "write", "hash", "sort", "batch",
               "node", "tree", "list", "map", "key", "value", "count",
               "score", "rank", "block", "page", "cache", "pool", "lock",
               "thread", "task", "job", "queue", "stream", "event", "row",
               "col", "term", "doc", "post", "seg"]


def _identifier_pool(rng: random.Random, n: int = 5000) -> List[str]:
    pool: List[str] = []
    while len(pool) < n:
        parts = rng.sample(_WORD_STEMS, rng.randint(2, 3))
        if rng.random() < 0.5:  # camelCase
            ident = parts[0] + "".join(p.capitalize() for p in parts[1:])
        else:  # snake_case
            ident = "_".join(parts)
        if rng.random() < 0.15:
            ident += str(rng.randint(0, 99))
        pool.append(ident)
    return pool


def generate_rows(n_files: int, seed: int = 42, locality: float = 0.0,
                  pool_size: int = 5000) -> List[Tuple[str, str, str, str, str, str]]:
    """Rows of (repo, path, commit, lang, content, content_sha).

    ``locality`` (0..1) is the fraction of identifier draws taken from a
    per-repo 150-identifier sub-pool instead of the global zipf pool —
    modeling real code corpora, where a repo's own identifiers/imports
    dominate its vocabulary. ``pool_size`` scales the global identifier
    pool: the 5,000 default keeps every term dense at test corpus sizes;
    Heaps-law-realistic corpora (vocabulary ~ N^0.7-0.9) need a pool that
    grows with n_files, which is where rare-term effects (docid-order
    compression, long-tail df) become visible. Defaults are bit-identical
    to the original generator (same RNG stream), so every cached fixture
    and fingerprint is unchanged; the docid-order layout experiment
    (jobs/docid_order_ab.py) uses locality > 0 and a scaled pool."""
    from itertools import accumulate

    rng = random.Random(seed)
    pool = _identifier_pool(rng, pool_size)
    # zipf-ish ranks: identifier i sampled with weight ~ 1/(i+1).
    # cum_weights makes each draw O(log n) (identical output to weights=).
    cum_weights = list(accumulate(1.0 / (i + 1) for i in range(len(pool))))
    repo_pools: Dict[str, List[str]] = {}

    def _repo_pool(repo: str) -> List[str]:
        got = repo_pools.get(repo)
        if got is None:
            # seeded per repo, independent of the main stream
            got = random.Random(f"{seed}_vocab_{repo}").sample(pool, 150)
            repo_pools[repo] = got
        return got

    rows = []
    for i in range(n_files):
        repo = f"org{i % 7}/repo{i % 23}"
        lang = rng.choices(LANGS, LANG_WEIGHTS)[0]
        pkg = f"pkg{rng.randint(0, 40)}"
        name = rng.choice(pool).replace("_", "")[:12] or "mod"
        path = f"src/{pkg}/{name}{i}.{LANG_EXT[lang]}"
        commit = hashlib.sha256(f"{repo}/{path}".encode()).hexdigest()[:12]
        n_lines = rng.randint(30, 300)
        lines = [f"// {' '.join(rng.choices(STOP_TERMS, k=8))}"]
        for _ in range(n_lines):
            if locality > 0.0:
                rp = _repo_pool(repo)
                idents = [
                    rp[int(rng.random() * len(rp))]
                    if rng.random() < locality
                    else rng.choices(pool, cum_weights=cum_weights, k=1)[0]
                    for _ in range(rng.randint(2, 6))
                ]
            else:
                idents = rng.choices(pool, cum_weights=cum_weights, k=rng.randint(2, 6))
            stops = rng.choices(STOP_TERMS, k=rng.randint(1, 4))
            lines.append(" ".join(stops[:1] + idents + stops[1:]))
        content = "\n".join(lines)
        sha = hashlib.sha256(content.encode()).hexdigest()
        rows.append((repo, path, commit, lang, content, sha))
    return rows


def write_corpus_parquet(spark, n_files: int, seed: int = 42,
                         cache_dir: str = "/root/repo/.cache",
                         locality: float = 0.0, pool_size: int = 5000) -> str:
    """Materialize the corpus once; return the parquet path."""
    loc = f"_l{locality}" if locality else ""
    loc += f"_p{pool_size}" if pool_size != 5000 else ""
    path = os.path.join(cache_dir, f"source_files_n{n_files}_s{seed}{loc}.parquet")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    os.makedirs(cache_dir, exist_ok=True)
    rows = generate_rows(n_files, seed, locality, pool_size)
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string, content_sha string"
    )
    # enough files that a local[32] scan gets full input parallelism
    df.repartition(max(16, n_files // 1250)).write.mode("overwrite").parquet(path)
    return path


def load_corpus(spark, n_files: int, seed: int = 42,
                cache_dir: str = "/root/repo/.cache", locality: float = 0.0,
                pool_size: int = 5000):
    """Corpus DataFrame with a deterministic dense doc_id (SURVEY §4.2 #4).

    Uses the scalable zipWithIndex-style assignment (range repartition +
    per-partition offsets) — a global row_number window would collapse the
    corpus to ONE partition and serialize every downstream stage.
    """
    from bertopic_spark.index.segments import assign_doc_ids

    df = spark.read.parquet(
        write_corpus_parquet(spark, n_files, seed, cache_dir, locality, pool_size))
    return assign_doc_ids(df, ["repo", "path", "commit"])


def fixture_queries(n: int = 40, seed: int = 7, corpus_seed: int = 42) -> Dict[int, str]:
    """FIXTURES.md §2: seeded query set over the corpus vocabulary —
    frequent terms, rare identifiers (camelCase + snake_case), ≥5 pure
    stop-term queries, ≥5 with an OOV term. The identifier pool must be the
    CORPUS pool (corpus_seed) so non-OOV query terms actually occur."""
    rng = random.Random(seed)
    pool = _identifier_pool(random.Random(corpus_seed))
    queries: Dict[int, str] = {}
    for qid in range(n):
        if qid < 5:  # stop-term-only
            queries[qid] = " ".join(rng.choices(STOP_TERMS, k=rng.randint(1, 3)))
        elif qid < 10:  # contains an OOV token
            queries[qid] = f"zzqq{qid}xx " + rng.choice(pool)
        else:
            k = rng.randint(1, 5)
            terms = rng.choices(pool, k=k)
            if rng.random() < 0.3:
                terms.append(rng.choice(STOP_TERMS))
            queries[qid] = " ".join(terms)
    return queries
