"""Property-based stream/batch parity for the sessionizer's r8
interval-merge scan (operators/sessionize.py::_make_session_fn).

The merge logic is a pure fold over (state, micro-batch) — so it is
tested here directly against a reference gap-scan, without Spark
streaming in the loop (the end-to-end drains live in
tests/test_streaming.py).  Two laws:

1. ONE batch, arbitrary arrival order == the batch twin's sessions.
2. Any chopping into micro-batches whose events arrive in
   non-decreasing time order (no late events) == the batch twin.

Late-event semantics beyond these laws are pinned by the targeted
tests (in-span widening, disjoint-before split) — cross-batch
lateness interacting with ALREADY-EMITTED sessions is the documented
append-mode divergence, deliberately outside the property.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from mahjong_etl_spark.operators.sessionize import GAP_SEC, _make_session_fn

GAP_US = GAP_SEC * 1_000_000


class _StubState:
    """Just enough of GroupState for the no-timeout fold."""

    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True

    def remove(self):  # pragma: no cover - timeout path unused here
        self._v, self.exists = None, False


def _reference_sessions(ts_list):
    """The batch twin: sorted gap-scan -> [(n_events, start, last)]."""
    out = []
    cur = None
    for t in sorted(ts_list):
        if cur is None or t - cur[2] > GAP_US:
            if cur is not None:
                out.append(cur)
            cur = [1, t, t]
        else:
            cur[0] += 1
            cur[2] = t
    if cur is not None:
        out.append(cur)
    return [tuple(c) for c in out]


def _drive(batches):
    """Run the fold over the chopped batches; return closed sessions
    plus the final open state in the reference's (n, start, last)
    shape."""
    fn = _make_session_fn(event_time_timeout=False)
    state = _StubState()
    closed = []
    for batch in batches:
        pdf = pd.DataFrame({"ts_us": batch})
        for out in fn((7,), iter([pdf]), state):
            for r in out.itertuples(index=False):
                closed.append((r.n_events, r.duration_sec))
    sessions = list(closed)
    if state.exists:
        start, last, n = state.get
        sessions.append((n, ((last - start) + 500) // 1000 / 1000.0))
    return sessions


def _as_n_dur(ref):
    return [
        (n, ((last - start) + 500) // 1000 / 1000.0) for n, start, last in ref
    ]


ts_lists = st.lists(
    st.integers(min_value=0, max_value=6 * GAP_US), min_size=1, max_size=30
)


@settings(max_examples=200, deadline=None)
@given(ts_lists, st.randoms())
def test_single_batch_any_order_matches_reference(ts, rnd):
    shuffled = list(ts)
    rnd.shuffle(shuffled)
    got = sorted(_drive([shuffled]))
    want = sorted(_as_n_dur(_reference_sessions(ts)))
    assert got == want


@settings(max_examples=200, deadline=None)
@given(ts_lists, st.data())
def test_sorted_chopping_matches_reference(ts, data):
    ordered = sorted(ts)
    # chop the sorted stream at random points into 1..5 micro-batches
    n_cuts = data.draw(st.integers(min_value=0, max_value=4))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=len(ordered)),
                min_size=n_cuts,
                max_size=n_cuts,
            )
        )
    )
    batches, prev = [], 0
    for c in [*cuts, len(ordered)]:
        if c > prev:
            batches.append(ordered[prev:c])
            prev = c
    got = sorted(_drive(batches))
    want = sorted(_as_n_dur(_reference_sessions(ts)))
    assert got == want


def test_disjoint_late_event_closes_as_own_session_unit():
    """The r8 fix at fold level: a late event > GAP before the open
    session closes immediately as a singleton, and the open session's
    span is untouched."""
    t0 = 10 * GAP_US
    got = _drive([[t0, t0 + 1_000_000], [0]])
    # singleton at 0 emitted closed; the open (2-event, 1s) session
    # remains in state and is appended by _drive
    assert sorted(got) == [(1, 0.0), (2, 1.0)]
