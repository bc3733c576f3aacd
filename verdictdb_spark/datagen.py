"""Deterministic synthetic source-code table generator.

BASELINE.json input_hint mandates the exact input shape:
``(repo:string, path:string, commit:string, lang:string,
content:string)``.  FIXTURES.md §1 fixes the generation rules:
Zipf-skewed repo sizes (one hot repo — exercises the tree-merge skew
path), ~20% duplicated contents (nontrivial distinct counts), fixed
seed.  Generated distributed (one seeded numpy RNG per partition
derived from the partition id) so the same table can be produced at
any scale without a driver-side loop.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LANGS = ["python", "java", "go", "js", "rust", "c", "md"]
EXT = {"python": "py", "java": "java", "go": "go", "js": "js", "rust": "rs", "c": "c", "md": "md"}
LANG_W = np.array([0.30, 0.20, 0.12, 0.15, 0.08, 0.10, 0.05])

_WORDS = (
    "def return import class self for while if else elif try except with as "
    "lambda yield from raise assert pass break continue int str list dict set "
    "public static void final new extends implements throws package func var "
    "const let struct impl trait match enum fn mut pub use mod crate printf "
    "include define sizeof typedef union goto switch case default"
).split()

FILES_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def _gen_partition(
    pid: int, rows: int, n_repos: int, seed: int, dup_rate: float, max_words: int = 600
) -> pd.DataFrame:
    rng = np.random.default_rng(seed * 1_000_003 + pid)
    # Zipf(a=1.3)-skewed repo ids clipped to [0, n_repos)
    rid = np.minimum(rng.zipf(1.3, size=rows) - 1, n_repos - 1)
    repo = np.array([f"org{i % 7}/repo{i}" for i in range(n_repos)])[rid]
    lang_i = rng.choice(len(LANGS), size=rows, p=LANG_W)
    lang = np.array(LANGS)[lang_i]
    ext = np.array([EXT[l] for l in LANGS])[lang_i]
    d = rng.integers(0, 40, size=rows)
    name = rng.integers(0, 10_000, size=rows)
    path = np.char.add(
        np.char.add(np.char.add("src/dir", d.astype(str)), "/f"),
        np.char.add(name.astype(str), np.char.add(".", ext)),
    )
    commit_id = rng.integers(0, 5, size=rows)
    commit = np.array(
        [f"{(rid[i] * 7 + commit_id[i]):040x}" for i in range(rows)], dtype=object
    )
    # Content: a seeded "pseudo-code" line repeated to a target length.
    # ~dup_rate of rows reuse a content id from a shared pool so exact
    # distinct counts are nontrivial (FIXTURES.md §1).
    content_id = rng.integers(0, 2**31, size=rows).astype(np.uint64)
    dup_mask = rng.random(rows) < dup_rate
    pool = rng.integers(0, max(rows // 10, 1), size=rows)  # shared small id space
    content_id = np.where(dup_mask, pool.astype(np.uint64), content_id)
    # Text is a pure function of content_id (so shared ids => identical
    # text), computed with vectorized multiply-shift word selection.
    w = np.array(_WORDS)
    A, B, C = np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F), np.uint64(0x165667B19E3779F9)
    with np.errstate(over="ignore"):
        spread = np.uint64(max(max_words - 30, 1))
        nwords = (30 + ((content_id * C) >> np.uint64(45)) % spread).astype(np.int64)
        maxw = int(nwords.max()) if rows else 0
        pos = np.arange(maxw, dtype=np.uint64)
        idx = (((content_id[:, None] * A) + pos[None, :] * B) >> np.uint64(40)) % np.uint64(len(w))
    words = w[idx.astype(np.int64)]
    contents = [" ".join(row[:n]) for row, n in zip(words, nwords)]
    return pd.DataFrame(
        {"repo": repo, "path": path, "commit": commit, "lang": lang, "content": contents}
    )


def code_files(
    spark: SparkSession,
    rows: int = 50_000,
    n_repos: int = 50,
    partitions: int = 8,
    seed: int = 42,
    dup_rate: float = 0.20,
    max_words: int = 600,
) -> DataFrame:
    """Deterministic distributed generation of the `files` table."""
    per = rows // partitions
    base = spark.range(partitions).select(F.col("id").cast("int").alias("pid"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for pid in pdf["pid"]:
                yield _gen_partition(int(pid), per, n_repos, seed, dup_rate, max_words)

    return base.repartition(partitions, "pid").mapInPandas(gen, FILES_SCHEMA)
