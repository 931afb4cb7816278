"""Custom Python DataSource: parallel deterministic corpus generation.

PySpark 4's Python DataSource API is the newest extension surface —
``spark.dataSource.register`` + ``spark.read.format("synthdocs")`` —
and this module uses it for the one thing the fixture files cannot do:
generate an ARBITRARILY LARGE documents corpus, partition-parallel and
byte-deterministic, to drive the dedup/text/curation operators beyond
fixture scale (``.option("docs", 10_000_000)`` costs no driver memory
and no files).

Design points:

- **Determinism under any parallelism**: every field is a pure
  function of (seed, doc_id) through the repo-standard md5 convention,
  so shard boundaries never change content — the same contract as
  ``generator.generate_bankdata_distributed``.
- **Planted duplicates**: every ``DUP_EVERY``-th doc repeats the text
  of the doc ``DUP_EVERY`` before it, so exact/fuzzy dedup operators
  have non-vacuous work at ANY generated size — and the planted set
  is the WHOLE duplicate story: the token stream is a 64-bit LCG
  chain seeded per text, so accidental whole-text collisions need a
  64-bit seed collision (~10⁻⁸ expected pairs at 1M docs) and the
  k-gram shingle space keeps growing with the corpus like real text.
  (An earlier ``(h0·(i+1)+i²) mod 1000003 mod 64`` stream collapsed
  134M 5-gram windows into 53k distinct values at 1M docs — df ≈
  2400 per shingle — which silently degenerated every shingle-keyed
  operator: prefix filtering fanned out df² candidates per key and
  PPJoin became all-pairs. Shingle diversity of generated text is a
  correctness property of the BENCHMARK, not just realism.)
- **Real filter pushdown** (Spark 4.1 ``pushFilters``): equality and
  IN filters on the ``shard`` column prune whole InputPartitions
  before a single row is generated — the Python-source analogue of
  partition pruning; all other filters are returned as unsupported so
  Spark keeps evaluating them.

Scale shape: one InputPartition per shard; ``read`` yields rows
straight from integer arithmetic (no I/O), so generation scales
linearly with executors like any map-only stage.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
)

LANGS = ("en", "de", "fr", "es")
SOURCES = ("web", "books", "code")
VOCAB = 64
DUP_EVERY = 13

_DEFAULTS = {"docs": "1000", "seed": "246", "docs_per_shard": "500"}


def _h(seed: int, doc_id: int, salt: str) -> int:
    key = f"{seed}:{salt}:{doc_id}".encode()
    return int(hashlib.md5(key).hexdigest()[:8], 16)


#: Newlib/Knuth MMIX LCG constants — full period mod 2⁶⁴; tokens take
#: bits 33–38 of the state, away from the weak low bits.
_LCG_A = 6364136223846793005
_LCG_C = 1442695040888963407
_M64 = (1 << 64) - 1
_TOKS = tuple(f"tok{v}" for v in range(VOCAB))


def doc_row(seed: int, doc_id: int) -> tuple:
    """The (doc_id, shard-less) record as a pure function of the id.

    Every DUP_EVERY-th doc copies its PREDECESSOR's text (doc_id − 1 is
    never itself a multiple of DUP_EVERY, so copy sources are always
    originals — no chains).

    The token stream is an LCG walk over 64-bit state seeded from a
    64-bit md5 prefix: each k-gram window is a function of the full
    state at its start position, so distinct shingles grow linearly
    with corpus tokens (birthday-bounded by the 64⁵ window space)
    instead of saturating — document frequencies stay O(1) and
    shingle-keyed operators (minhash, span dedup, PPJoin prefixes,
    Bloom probes) keep their production shape at any generated size."""
    text_id = (doc_id - 1
               if doc_id % DUP_EVERY == 0 and doc_id > 0 else doc_id)
    n_toks = 20 + _h(seed, text_id, "len") % 230
    x = int(hashlib.md5(
        f"{seed}:txt:{text_id}".encode()).hexdigest()[:16], 16)
    toks = []
    for _ in range(n_toks):
        x = (x * _LCG_A + _LCG_C) & _M64
        toks.append(_TOKS[(x >> 33) % VOCAB])
    text = " ".join(toks)
    lang = LANGS[_h(seed, doc_id, "lang") % len(LANGS)]
    source = SOURCES[_h(seed, doc_id, "src") % len(SOURCES)]
    return doc_id, text, lang, source, len(text)


class SynthDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.docs = int(options.get("docs", _DEFAULTS["docs"]))
        self.seed = int(options.get("seed", _DEFAULTS["seed"]))
        self.per_shard = int(
            options.get("docs_per_shard", _DEFAULTS["docs_per_shard"]))
        self.n_shards = -(-self.docs // self.per_shard)
        self.wanted: set[int] | None = None   # None → all shards

    def pushFilters(self, filters: "list[Filter]") -> "Iterator[Filter]":
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("shard",):
                self.wanted = {int(f.value)}
            elif isinstance(f, In) and f.attribute == ("shard",):
                self.wanted = {int(v) for v in f.value}
            else:
                yield f                        # unsupported → Spark keeps it

    def partitions(self) -> "Sequence[InputPartition]":
        shards = range(self.n_shards)
        if self.wanted is not None:
            shards = [s for s in shards if s in self.wanted]
        return [InputPartition(s) for s in shards]

    def read(self, partition: InputPartition):
        # A pushed-down shard filter matching NO shard (e.g. shard == 7
        # on a 2-shard source) yields an empty partitions() list, which
        # PySpark's plan_data_source_read substitutes with [None] and
        # still calls read(None) once — the empty-result contract is
        # "yield nothing", not "never called".
        if partition is None:
            return
        shard = partition.value
        lo = shard * self.per_shard
        hi = min(lo + self.per_shard, self.docs)
        for doc_id in range(lo, hi):
            did, text, lang, source, n_chars = doc_row(self.seed, doc_id)
            yield (did, shard, text, lang, source, n_chars)


class SynthDocsStreamReader(DataSourceStreamReader):
    """The streaming half of the same source: offsets are document
    ids, so the feed is file-less and exactly-once by construction —
    ``availableNow`` drains [initialOffset, docs) once and a
    checkpointed re-run is a no-op. The drained range splits into
    shard-sized partitions with the SAME per-doc derivation as the
    batch reader (batch/stream parity is a test, not a hope)."""

    def __init__(self, options: dict):
        self.docs = int(options.get("docs", _DEFAULTS["docs"]))
        self.seed = int(options.get("seed", _DEFAULTS["seed"]))
        self.per_shard = int(
            options.get("docs_per_shard", _DEFAULTS["docs_per_shard"]))

    def initialOffset(self) -> dict:
        return {"doc_id": 0}

    def latestOffset(self) -> dict:
        # A bounded corpus: everything is available "now". An unbounded
        # feed would advance this with wall-clock or upstream position.
        return {"doc_id": self.docs}

    def partitions(self, start: dict, end: dict) -> "Sequence[InputPartition]":
        lo, hi = int(start["doc_id"]), int(end["doc_id"])
        return [
            InputPartition((p, min(p + self.per_shard, hi)))
            for p in range(lo, hi, self.per_shard)
        ]

    def read(self, partition: InputPartition):
        lo, hi = partition.value
        for doc_id in range(lo, hi):
            did, text, lang, source, n_chars = doc_row(self.seed, doc_id)
            yield (did, doc_id // self.per_shard, text, lang, source,
                   n_chars)

    def commit(self, end: dict) -> None:
        pass                                   # nothing external to ack


class SynthDocsDataSource(DataSource):
    """``spark.read.format("synthdocs").option("docs", N).load()`` —
    and ``spark.readStream.format("synthdocs")`` for the offset-driven
    streaming feed."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return ("doc_id long, shard int, text string, lang string, "
                "source string, n_chars long")

    def reader(self, schema) -> SynthDocsReader:
        return SynthDocsReader(dict(self.options))

    def streamReader(self, schema) -> SynthDocsStreamReader:
        return SynthDocsStreamReader(dict(self.options))


def register(spark) -> None:
    """Register the source and enable Python-source filter pushdown
    (off by default in Spark 4.1; a reader that implements
    ``pushFilters`` refuses to run without it, loudly)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SynthDocsDataSource)
