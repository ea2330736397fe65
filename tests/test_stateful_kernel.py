"""Focused equivalence test for the r11 vectorized sessionizer kernel.

`streaming.stateful._update_sessions` replaced its per-row Python fold
with a NumPy segmentation (guide §4). This test drives the kernel
directly through a fake GroupState and requires bit-identical emissions
and state against a REFERENCE implementation of the original fold, on
exactly the hostile input classes the fold handled implicitly:

* late rows OLDER than the carried state (watermark 10m > gap 5m admits
  them): boundaries must extend monotonically, never move backward;
* a raw timestamp gap > 5m that is still bridged by the carried
  state_last (no break — the running-max subtlety);
* state closed by the batch's first row; multiple breaks; empty input;
* the hasTimedOut flush path.
"""

from __future__ import annotations

import pandas as pd
import pytest

from excel_to_db_spark.streaming.stateful import _GAP_US, _update_sessions


class FakeState:
    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.timeout_set = None
        self.removed = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(int(x) for x in v)

    def remove(self):
        self._v, self.removed = None, True

    def setTimeoutTimestamp(self, ms):
        self.timeout_set = int(ms)


def _reference_fold(user_id, ts_list, state):
    """The pre-r11 per-row fold, verbatim semantics."""
    out = []
    if state.hasTimedOut:
        start, last, n = state.get
        out.append((user_id, start, last, n, "timeout"))
        state.remove()
        return out
    start, last, n = state.get if state.exists else (None, None, 0)
    if not ts_list:
        return out
    for t in sorted(ts_list):
        if start is None:
            start, last, n = t, t, 1
        elif t - last <= _GAP_US:
            start, last, n = min(start, t), max(last, t), n + 1
        else:
            out.append((user_id, start, last, n, "gap"))
            start, last, n = t, t, 1
    state.update((int(start), int(last), int(n)))
    state.setTimeoutTimestamp(int(last) // 1000 + _GAP_US // 1000)
    return out


def _run_kernel(ts_list, state):
    pdfs = ([pd.DataFrame({"ts": pd.Series(ts_list, dtype="int64")})]
            if ts_list is not None else [])
    frames = list(_update_sessions((7,), iter(pdfs), state))
    rows = []
    for f in frames:
        for r in f.itertuples(index=False):
            rows.append((r.user_id,
                         r.sess_start.value // 1000,
                         r.sess_last.value // 1000,
                         r.n_events, r.closed_by))
    return rows


G = _GAP_US
M = 60 * 1_000_000  # one minute in us

CASES = [
    # fresh key, one session
    (None, [0, M, 2 * M]),
    # fresh key, two breaks
    (None, [0, M, 10 * M, 11 * M, 30 * M]),
    # state merges with first segment
    ((0, 2 * M, 3), [2 * M + G, 2 * M + G + M]),
    # state closed by the first row
    ((0, M, 2), [M + G + 1, M + G + 2]),
    # late rows older than carried state: extend, never move back
    ((5 * M, 9 * M, 4), [6 * M, 7 * M, 9 * M + 1]),
    # raw diff > gap BRIDGED by state_last (running-max subtlety):
    # state_last=10m; rows 6m and 6m+G+1us are >gap apart raw, but both
    # within gap of 10m — one merged session in the fold
    ((0, 10 * M, 2), [6 * M, 6 * M + G + 1]),
    # state closed, then a multi-break batch
    ((0, 0, 1), [G + 1, G + 1 + M, 3 * (G + M), 5 * (G + M)]),
    # empty batch, carried state untouched
    ((0, M, 2), []),
    # single late row inside the carried span
    ((0, 9 * M, 5), [M]),
]


@pytest.mark.parametrize("state0,ts", CASES)
def test_vectorized_kernel_equals_fold(state0, ts):
    ref_state = FakeState(state0)
    new_state = FakeState(state0)
    want = _reference_fold(7, list(ts), ref_state)
    got = _run_kernel(list(ts), new_state)
    assert got == want
    assert new_state._v == ref_state._v
    assert new_state.timeout_set == ref_state.timeout_set


def test_timeout_flush_path():
    ref_state = FakeState((3 * M, 4 * M, 9), timed_out=True)
    new_state = FakeState((3 * M, 4 * M, 9), timed_out=True)
    want = _reference_fold(7, [], ref_state)
    got = _run_kernel(None, new_state)
    assert got == want == [(7, 3 * M, 4 * M, 9, "timeout")]
    assert new_state.removed and ref_state.removed
