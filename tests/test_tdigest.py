"""Property tests for the mergeable quantile-sketch kernel
(operators/timeseries.py::_compress/_quantile): determinism, weight
conservation, bounded rank error, and merge consistency — the invariants
that make per-day sketches safely mergeable across rolling windows."""

import numpy as np
from hypothesis import given, settings, strategies as st

from migbq_spark.operators.timeseries import _TDIGEST_K, _compress, _quantile

values = st.lists(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    min_size=1,
    max_size=2000,
)


@given(values)
@settings(max_examples=60, deadline=None)
def test_compress_conserves_weight_and_bounds_size(vals):
    v = np.array(vals, dtype=np.float64)
    cv, cw = _compress(v, np.ones_like(v))
    assert len(cv) <= max(_TDIGEST_K, len(v))
    assert np.isclose(cw.sum(), len(v))
    # centroids are sorted and within the data range
    assert np.all(np.diff(cv) >= -1e-9)
    assert cv.min() >= v.min() - 1e-9 and cv.max() <= v.max() + 1e-9


def _rank_err(v, est, q):
    """Distance from q to the rank INTERVAL of est in sorted v — tied
    values occupy a rank range, and any rank inside it is exact."""
    lo = np.searchsorted(v, est, side="left") / len(v)
    hi = np.searchsorted(v, est, side="right") / len(v)
    if lo <= q <= hi:
        return 0.0
    return min(abs(q - lo), abs(q - hi))


@given(values, st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9, 0.95]))
@settings(max_examples=60, deadline=None)
def test_quantile_rank_error_bounded(vals, q):
    v = np.sort(np.array(vals, dtype=np.float64))
    cv, cw = _compress(v, np.ones_like(v))
    est = _quantile(cv, cw, q)
    # rank of the estimate in the exact data must be within ~2 bins
    assert _rank_err(v, est, q) <= 2.0 / _TDIGEST_K + 2.0 / len(v) + 1e-9


@given(values, values)
@settings(max_examples=40, deadline=None)
def test_merged_sketch_matches_pooled_sketch_error(a, b):
    """Merging two compressed sketches must stay within the same error
    envelope as compressing the pooled raw data — the property the
    rolling 7-day merge relies on."""
    va, vb = np.array(a, dtype=np.float64), np.array(b, dtype=np.float64)
    pool = np.sort(np.concatenate([va, vb]))
    ca, wa = _compress(va, np.ones_like(va))
    cb, wb = _compress(vb, np.ones_like(vb))
    mv, mw = _compress(np.concatenate([ca, cb]), np.concatenate([wa, wb]))
    assert np.isclose(mw.sum(), len(pool))
    for q in (0.5, 0.95):
        est = _quantile(mv, mw, q)
        assert _rank_err(pool, est, q) <= 4.0 / _TDIGEST_K + 4.0 / len(pool) + 1e-9
