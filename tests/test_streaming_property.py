"""Property tests for the pure streaming state cores (asof / funnel /
retention): for ANY arrival order, ANY batch split, and ANY
non-decreasing watermark schedule, the emitted stream must equal the
batch reference computed over the rows that survived the late filter.
This is the core-level form of the availableNow batch-parity claim —
the end-to-end tests pin one schedule; these pin all of them.

The simulation mirrors Spark's contract: each batch's arrivals are
late-filtered against the CURRENT watermark (rows with event-time ms
strictly below it drop), the state fn then runs with that same
watermark, and the schedule ends with a final no-data flush at a
watermark past every event (availableNow's no-data batch +
event-time timeout).

Event milliseconds are generated EVEN and watermarks ODD: maturity is
millisecond-granular and inclusive (``ts_ms <= wm`` — required so the
final flush can drain rows AT the terminal watermark), while Spark's
late filter is exclusive (``ts_ms < wm`` drops) — so a row arriving
with ts exactly equal to an already-processed watermark is the one
boundary where emitted history can't see it (the module-docstring
caveat). Keeping parities disjoint tests everything EXCEPT that
documented boundary."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from generalized_kmeans_clustering_spark.streaming.asof import (
    _asof_step_bwd, _asof_step_fwd, _tbk,
)
from generalized_kmeans_clustering_spark.streaming.funnel import (
    _funnel_step,
)
from generalized_kmeans_clustering_spark.streaming.retention import (
    _retention_step,
)

pytestmark = pytest.mark.filterwarnings("ignore::DeprecationWarning")

MS = 1000  # µs per ms


def _schedule(draw, rows, max_batches=4):
    """Split rows into arrival batches + a non-decreasing watermark
    per batch, ending with a final flush past every event."""
    n = len(rows)
    k = draw(st.integers(1, max_batches))
    assign = draw(st.lists(st.integers(0, k - 1), min_size=n, max_size=n))
    batches = [[r for r, a in zip(rows, assign) if a == i]
               for i in range(k)]
    top = (max((r[0] for r in rows), default=0) // MS) + 2
    wms = sorted(draw(st.lists(                 # odd watermarks only
        st.integers(0, top // 2).map(lambda x: 2 * x + 1),
        min_size=k, max_size=k)))
    return batches, wms, top


def _drive(step, batches, wms, top):
    """Run the (late-filter → step) loop; ``step(buf, wm)`` folds and
    returns (emits, keep). Ends with the final no-data flush."""
    emits, buf, survived = [], [], []
    for batch, wm in zip(batches, wms):
        alive = [r for r in batch if r[0] // MS >= wm]
        survived += alive
        e, buf = step(buf + alive, wm)
        emits += e
    e, buf = step(buf, top)
    emits += e
    assert buf == []
    return emits, survived


# --------------------------------------------------------------- asof
@st.composite
def asof_case(draw):
    """Rows in the generalized core shape ``(ts, side, lid, tb,
    payload_tuple)`` with a STRUCT payload (float, str) and the float
    doubling as the tiebreak (the pre-r9 'greatest value wins' rule,
    now expressed through the explicit tiebreak contract)."""
    n = draw(st.integers(1, 24))
    rows = []
    for i in range(n):
        # even-ms event times (see module doc) + sub-ms component
        t = 2 * draw(st.integers(0, 20)) * MS + draw(st.integers(0, 999))
        if draw(st.booleans()):
            rows.append((t, 1, 100 + i, None, (None, None)))   # left
        else:
            v = float(draw(st.integers(0, 9)))
            rows.append((t, 0, None, v, (v, f"s{v}")))
    sched = _schedule(draw, rows)
    return rows, sched


@settings(max_examples=200, deadline=None)
@given(asof_case())
def test_asof_bwd_core_matches_reference_under_any_schedule(case):
    rows, (batches, wms, top) = case
    state = {"floor": None}

    def step(buf, wm):
        e, keep, state["floor"] = _asof_step_bwd(
            buf, state["floor"], wm, None)
        return e, keep

    emits, survived = _drive(step, batches, wms, top)
    lefts = [r for r in survived if r[1] == 1]
    rights = [r for r in survived if r[1] == 0]
    assert sorted(e[0] for e in emits) == sorted(r[2] for r in lefts)
    ref = {}
    for _, _, lid, _, _ in lefts:
        lt = next(r[0] for r in lefts if r[2] == lid)
        cand = [r for r in rights if r[0] <= lt]
        if cand:
            mt, mtb = max((r[0], _tbk(r[3])) for r in cand)
            mp = next(r[4] for r in cand
                      if (r[0], _tbk(r[3])) == (mt, mtb))
            ref[lid] = (mt, mp)
        else:
            ref[lid] = (None, None)
    got = {e[0]: (e[2], e[3]) for e in emits}
    assert got == ref


@st.composite
def asof_fwd_case(draw):
    rows, sched = draw(asof_case())
    tol_ms = draw(st.one_of(st.none(), st.integers(1, 15)))
    return rows, (None if tol_ms is None else 2 * tol_ms * MS), sched


@settings(max_examples=200, deadline=None)
@given(asof_fwd_case())
def test_asof_fwd_core_matches_reference_under_any_schedule(case):
    rows, tol_us, (batches, wms, top) = case
    state = {"pending": []}

    def step(buf, wm):
        e, keep, state["pending"] = _asof_step_fwd(
            buf, state["pending"], wm, tol_us)
        return e, keep

    emits, survived = _drive(step, batches, wms, top)
    lefts = [r for r in survived if r[1] == 1]
    rights = [r for r in survived if r[1] == 0]
    # the drawn per-batch watermarks may exceed the final-flush value
    # (the generator doesn't cap them at `top`); expiry is judged
    # against the highest watermark the core ever saw
    wm_max = max([top, *wms])
    ref, held = {}, set()
    for _, _, lid, _, _ in lefts:
        lt = next(r[0] for r in lefts if r[2] == lid)
        cand = [r for r in rights if r[0] >= lt
                and (tol_us is None or r[0] - lt <= tol_us)]
        if cand:
            mt, mtb = min((r[0], _tbk(r[3])) for r in cand)
            mp = next(r[4] for r in cand
                      if (r[0], _tbk(r[3])) == (mt, mtb))
            ref[lid] = (mt, mp)
        elif tol_us is not None and (lt + tol_us) // MS < wm_max:
            ref[lid] = (None, None)     # expiry provable -> unmatched
        else:
            held.add(lid)               # documented: cannot prove
    got = {e[0]: (e[2], e[3]) for e in emits}
    assert got == ref
    assert {p[1] for p in state["pending"]} == held


# ------------------------------------------------------------- funnel
@st.composite
def funnel_case(draw):
    k = draw(st.integers(2, 4))
    n = draw(st.integers(1, 24))
    rows = [(2 * draw(st.integers(0, 20)) * MS + draw(st.integers(0, 999)),
             draw(st.integers(0, k - 1))) for _ in range(n)]
    span = draw(st.one_of(st.none(), st.integers(1, 30)))
    sched = _schedule(draw, rows)
    return k, rows, (None if span is None else span * MS), sched


@settings(max_examples=200, deadline=None)
@given(funnel_case())
def test_funnel_core_matches_reference_under_any_schedule(case):
    k, rows, span_us, (batches, wms, top) = case
    state = {"times": [None] * k, "done": False, "emitted": 0}

    def step(buf, wm):
        comp, keep, state["times"], state["done"] = _funnel_step(
            buf, state["times"], state["done"], wm, span_us)
        if comp:
            state["emitted"] += 1
            return [tuple(state["times"])], keep
        return [], keep

    emits, survived = _drive(step, batches, wms, top)
    # batch reference: first-touch strict-after chain over survivors
    times = [None] * k
    for t, j in sorted(survived):
        if j == 0:
            if times[0] is None:
                times[0] = t
        elif times[j] is None and times[j - 1] is not None \
                and t > times[j - 1]:
            if span_us is not None and t - times[0] > span_us:
                continue
            times[j] = t
    if times[k - 1] is not None:
        assert emits == [tuple(times)]
    else:
        assert emits == []
    assert state["emitted"] <= 1


# ---------------------------------------------------------- retention
@st.composite
def retention_case(draw):
    n = draw(st.integers(1, 24))
    rows = []
    for _ in range(n):
        period = draw(st.integers(0, 6))        # bucket index
        within = 2 * draw(st.integers(0, 499))  # even-ms position
        t = (period * 10_000 + within) * MS
        rows.append((t, period * 10_000 * MS, period))  # (_t, _b, mix)
    cap = draw(st.one_of(st.none(), st.integers(0, 4)))
    sched = _schedule(draw, rows)
    return rows, cap, sched


@settings(max_examples=200, deadline=None)
@given(retention_case())
def test_retention_core_matches_reference_under_any_schedule(case):
    rows, cap, (batches, wms, top) = case
    state = {"cohort": None, "cmix": None, "seen": set()}

    def step(buf, wm):
        e, keep, state["cohort"], state["cmix"], state["seen"] = \
            _retention_step(buf, state["cohort"], state["cmix"],
                            state["seen"], wm, cap)
        return e, keep

    emits, survived = _drive(step, batches, wms, top)
    assert len(emits) == len(set(emits))          # exactly-once
    if not survived:
        assert emits == []
        return
    first = min(survived)
    cohort_b, cmix = first[1], first[2]
    ref = set()
    for _, b, mix in survived:
        off = mix - cmix
        if cap is not None and off > cap:
            continue
        ref.add((cohort_b, off))
    assert set(emits) == ref
