"""The driver-window rotation contract (__spark_entry__._attestation_order).

The correctness driver records official rows for the first
ATTESTATION_WINDOW_W (=50) ``queries()`` entries only; these tests pin the property that makes
that window a fair rotation: the returned order is least-recently-
GREEN-attested first, so the window always holds the most-stale
queries the registry has (optimal for any window size — the capacity
arithmetic in the _attestation_order docstring is then the only
residual staleness source)."""

import glob
import json
import os
import re

import __spark_entry__ as em

# Single source of truth for the policy constants (r11 advisor
# finding): the test reads the SAME names the ordering code and its
# docstring state, so a driver-window or budget change updates the
# policy prose and this machine-check atomically.
W = em.ATTESTATION_WINDOW_W
N_MAX = em.ATTESTATION_NEW_ROW_BUDGET

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _last_green():
    last = {}
    for p in glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)", os.path.basename(p))
                  .group(1))
        with open(p) as f:
            data = json.load(f)
        for k, v in data.items():
            if (isinstance(v, dict) and v.get("rows_match")
                    and v.get("schema_match") and v.get("hash_match")):
                last[k] = max(last.get(k, -1), rnd)
    return last


def test_order_is_most_stale_first():
    names = list(em.queries().keys())
    last = _last_green()
    rounds = [last.get(n, -1) for n in names]
    assert rounds == sorted(rounds), (
        "queries() must be ordered least-recently-attested first")
    # never-attested queries (no official row at all) lead everything
    first_attested = next(
        (i for i, r in enumerate(rounds) if r >= 0), len(rounds))
    assert all(r == -1 for r in rounds[:first_attested])


def test_window_holds_the_global_most_stale_set():
    """The first W entries are exactly a most-stale W-subset: no
    query outside the window is staler than any query inside it."""
    names = list(em.queries().keys())
    last = _last_green()
    if len(names) <= W:
        return
    max_in = max(last.get(n, -1) for n in names[:W])
    min_out = min(last.get(n, -1) for n in names[W:])
    assert max_in <= min_out


def test_official_staleness_within_policy():
    """The r11 attestation policy (see _attestation_order docstring):
    every attested query's latest official green row is at most
    P = ceil((N-W)/(W-n_max)) + 1 rounds old, where
    W = em.ATTESTATION_WINDOW_W is the driver window and
    n_max = em.ATTESTATION_NEW_ROW_BUDGET the per-round new-row
    budget — and the
    at-the-bound set must FIT the next window, or the bound breaks
    next round. The interim tier (every query value-verified per
    round at sf0.001) is this very test file's sibling,
    test_entry_oracle.py."""
    names = list(em.queries().keys())
    last = _last_green()
    rounds = [last.get(n, -1) for n in names]
    attested = [r for r in rounds if r >= 0]
    if not attested:
        return
    cur = max(attested)          # latest completed driver round
    N = len(names)
    p_bound = -(-(N - W) // (W - N_MAX)) + 1
    stale = [n for n, r in zip(names, rounds)
             if 0 <= r < cur - p_bound + 1]
    assert not stale, (
        f"official rows older than the P={p_bound}-round policy bound "
        f"(current round {cur}): {stale}")
    # the due set (never-attested + at-the-bound) must fit one window
    due = sum(1 for r in rounds if r < 0 or r == cur - p_bound + 1)
    assert due <= W, (
        f"{due} queries due next round exceeds the W={W} window — "
        "the policy bound will break; shrink the new-row budget")


def test_every_query_has_an_oracle_or_documented_exemption():
    """queries() and oracle_sql() stay 1:1 — every official row the
    rotation schedules is a full value-hash row, not a weaker
    rows-only check."""
    q = set(em.queries().keys())
    o = set(em.oracle_sql().keys())
    assert q == o, (sorted(q - o), sorted(o - q))
