"""Streaming corpus admission control — a per-source token-budget
gate on the document ingest stream.

WHY THIS OPERATOR IS STATEFUL-ONLY.  The admission rule is the greedy
fold every ingestion quota actually runs: a document is accepted iff
the tokens ACCEPTED SO FAR for its source plus its own tokens fit the
budget; a rejected document does NOT consume budget, so a later
smaller document can still be admitted.  That "accepted so far" term
makes the fold order-dependent and non-prefix-monotonic — it is not a
window cumulative sum (the batch ``corpus_source_quota`` lottery IS
window-expressible because its rank ignores running totals), not
expressible in ANSI SQL without a per-row recursive scan, and exactly
what a state store is for.

TWO WIRINGS, ONE PROCESSOR SEMANTICS:

- ``admission_stream``: ``applyInPandasWithState`` (GroupState), the
  engine's established stateful surface (sessionize, z-score anomaly).
  This is the tested-in-CI production path.
- ``admission_stream_tws`` + ``AdmissionProcessor``:
  ``transformWithStateInPandas`` (Spark 4 arbitrary-state v2 API) —
  named TYPED state variables per key (a ValueState of exact int64
  totals plus a MapState of per-language admit counts) instead of one
  hand-packed tuple.  The v2 runtime speaks protobuf between the JVM
  and a Python state server (pyspark
  ``sql/streaming/proto/StateMessage_pb2.py`` imports
  ``google.protobuf`` at query start), and this build environment
  does not ship the Python protobuf package, so CI drives
  ``AdmissionProcessor`` through a faithful in-memory handle
  (tests/test_admission_stream.py::FakeHandle) and pins it
  row-identical to both the reference fold and the GroupState stream;
  on a cluster whose Python env has protobuf (any real Spark distro
  requirement set) the TWS wiring runs as-is with the RocksDB state
  store provider.

DETERMINISM DISCIPLINE (matches anomaly_stream.py): rows are folded
in (ts, doc_id) order WITHIN each micro-batch group, so for any batch
chopping that respects per-source arrival order the admitted set is
identical — one AvailableNow drain reproduces the single-process fold
bit-for-bit.  All state is exact int64 token counts plus the admitted
language set; no floats anywhere.

Scale: state per source is two int64s + the admitted-language set —
bounded by the key space, not stream length, so no timeout/expiry is
needed for correctness.  The stream shuffles once on source; a 100 TB
ingest with a few hundred sources is a few-hundred-key exchange.
(Skew: one hot source serializes its own admissions by construction —
admission is a sequential fold per budget domain, so per-source
ordering IS the semantics; shard the BUDGET, not the operator, if a
source outgrows a task.)

STATE FORMAT: v2 (n_accepted, tok_accepted, langs_json) — langs is a
sorted JSON array, delimiter-proof for any lang value.  Not
restart-compatible with a v1 (CSV-encoded) checkpoint; v1 never
shipped outside the round that replaced it, so there is no migration
path — restart such a stream from a fresh checkpoint and let the
source replay.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Token budget each source may admit (tokens = whitespace token count,
# the text_token_stats definition).  Small enough that test fixtures
# exercise both accept and reject branches.
ADMIT_BUDGET = 2_000

ADMIT_OUT = StructType(
    [
        StructField("source", StringType()),
        StructField("doc_id", LongType()),
        StructField("n_tokens", LongType()),
        StructField("accepted", BooleanType()),
        StructField("budget_used", LongType()),
        StructField("n_langs_admitted", LongType()),
    ]
)

# GroupState tuple: (n_accepted, tok_accepted, langs_json)
# langs_json is a sorted JSON array — delimiter-proof for any lang
# value (empty string, embedded commas), unlike a joined CSV
ADMIT_STATE = StructType(
    [
        StructField("n_accepted", LongType()),
        StructField("tok_accepted", LongType()),
        StructField("langs_json", StringType()),
    ]
)


def _fold_batch(
    source: str,
    batch: pd.DataFrame,
    n_acc: int,
    tok_acc: int,
    langs: set,
    admit_lang,
) -> tuple[pd.DataFrame, int, int]:
    """The shared greedy fold: one micro-batch group for one source.
    ``admit_lang(lang)`` is called once per ACCEPTED doc so each
    wiring can maintain its own language-state representation."""
    batch = batch.sort_values(["ts", "doc_id"], kind="mergesort")
    out = []
    for r in batch.itertuples(index=False):
        tok = int(r.n_tokens)
        ok = tok_acc + tok <= ADMIT_BUDGET
        if ok:
            n_acc += 1
            tok_acc += tok
            langs.add(r.lang)
            admit_lang(r.lang)
        out.append((source, int(r.doc_id), tok, ok, tok_acc, len(langs)))
    return (
        pd.DataFrame(
            out,
            columns=[
                "source",
                "doc_id",
                "n_tokens",
                "accepted",
                "budget_used",
                "n_langs_admitted",
            ],
        ),
        n_acc,
        tok_acc,
    )


# ---------------------------------------------------------------------------
# Wiring 1 (CI production path): applyInPandasWithState
# ---------------------------------------------------------------------------


def _admit_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n_acc, tok_acc, langs_json = state.get
        langs = set(json.loads(langs_json))
    else:
        n_acc = tok_acc = 0
        langs = set()
    batch = pd.concat(list(pdfs), ignore_index=True)
    out, n_acc, tok_acc = _fold_batch(
        key[0], batch, n_acc, tok_acc, langs, lambda _lang: None
    )
    # None-safe sort: a nullable lang column puts None in the set, and
    # sorted() on a mixed None/str set raises TypeError on the
    # executor — the fold itself and the TWS wiring both tolerate
    # None, so the three row-identical surfaces must too (r7 advice)
    state.update(
        (
            n_acc,
            tok_acc,
            json.dumps(sorted(langs, key=lambda v: (v is None, v or ""))),
        )
    )
    yield out


def admission_stream(docs: DataFrame) -> DataFrame:
    """Wire the admission fold onto a streaming documents frame with
    columns (doc_id, ts, source, lang, n_tokens) via GroupState."""
    return docs.groupBy("source").applyInPandasWithState(
        _admit_group,
        outputStructType=ADMIT_OUT,
        stateStructType=ADMIT_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Wiring 2 (Spark 4 arbitrary-state v2): transformWithStateInPandas
# ---------------------------------------------------------------------------

_TOTALS_SCHEMA = StructType(
    [
        StructField("n_accepted", LongType()),
        StructField("tok_accepted", LongType()),
    ]
)

_LANG_KEY = StructType([StructField("lang", StringType())])
_LANG_VAL = StructType([StructField("n", LongType())])

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class AdmissionProcessor:
    """transformWithState processor for the same greedy fold.

    Deliberately duck-typed (same method surface as
    ``pyspark.sql.streaming.stateful_processor.StatefulProcessor``)
    rather than subclassing, so the class imports and unit-tests in
    environments without the v2 runtime's protobuf dependency; Python
    dispatch on the worker is duck-typed too.

    State:
      - ``totals``  (ValueState): (n_accepted, tok_accepted)
      - ``by_lang`` (MapState):   (lang,) -> (admitted-doc count,)
    """

    def init(self, handle: Any) -> None:
        self._totals = handle.getValueState("totals", _TOTALS_SCHEMA)
        self._by_lang = handle.getMapState("by_lang", _LANG_KEY, _LANG_VAL)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n_acc, tok_acc = (
            self._totals.get() if self._totals.exists() else (0, 0)
        )
        langs = {k[0] for k in self._by_lang.keys()}  # noqa: SIM118 (MapState)

        def admit_lang(lang: str) -> None:
            prev = (
                self._by_lang.getValue((lang,))[0]
                if self._by_lang.containsKey((lang,))
                else 0
            )
            self._by_lang.updateValue((lang,), (prev + 1,))

        batch = pd.concat(list(rows), ignore_index=True)
        out, n_acc, tok_acc = _fold_batch(
            key[0], batch, n_acc, tok_acc, langs, admit_lang
        )
        self._totals.update((n_acc, tok_acc))
        yield out

    def close(self) -> None:
        pass


def admission_stream_tws(docs: DataFrame) -> DataFrame:
    """transformWithStateInPandas wiring of the admission fold.

    Requires (a) the RocksDB state store provider (the only provider
    implementing v2 multi-variable state) and (b) the Python protobuf
    package on driver and executors — see module docstring."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _P(AdmissionProcessor, StatefulProcessor):
        pass

    return docs.groupBy("source").transformWithStateInPandas(
        statefulProcessor=_P(),
        outputStructType=ADMIT_OUT,
        outputMode="append",
        timeMode="none",
    )


def admission_fold(rows) -> list[tuple]:
    """Single-process reference fold (the semantics oracle both
    streams must reproduce): rows is an iterable of (doc_id, ts,
    source, lang, n_tokens) in per-source arrival order."""
    totals: dict[str, int] = {}
    langs: dict[str, set] = {}
    out = []
    for doc_id, _ts, source, lang, tok in rows:
        used = totals.get(source, 0)
        ok = used + tok <= ADMIT_BUDGET
        if ok:
            used += tok
            totals[source] = used
            langs.setdefault(source, set()).add(lang)
        out.append(
            (source, doc_id, tok, ok, used, len(langs.get(source, ())))
        )
    return out
