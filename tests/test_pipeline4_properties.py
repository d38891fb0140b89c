"""Property tests for the round-5 wave integer protocols: the
2*avg-rank trick, the containment threshold, the largest-remainder-free
Wilson/Welch IEEE recomputes, and the CUSUM scaling — each checked
against a brute-force definition on Hypothesis-generated inputs.

These run engine-free (plain Python mirrors of the protocol math), so
they exercise the NUMERIC contracts at corners the fixtures never hit:
all-ties, single-element groups, extreme skew."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st


# --- the 2*avg-rank protocol (q_mannwhitney_u / q_spearman_corr / q_auc_roc)


def _two_avg_ranks(values):
    """Protocol: 2*avg-rank per value from the sorted domain."""
    c = Counter(values)
    out = {}
    rank = 1
    for v in sorted(c):
        cnt = c[v]
        out[v] = 2 * rank + cnt - 1  # == 2 * average rank of the tie group
        rank += cnt
    return out


@given(st.lists(st.integers(-50, 50), min_size=1, max_size=200))
@settings(max_examples=200, deadline=None)
def test_two_avg_rank_equals_textbook_average_rank(values):
    r2 = _two_avg_ranks(values)
    # brute force: average rank over the fully expanded sorted list
    s = sorted(values)
    for v in set(values):
        positions = [i + 1 for i, x in enumerate(s) if x == v]
        avg = sum(positions) / len(positions)
        assert r2[v] == int(2 * avg)
        assert r2[v] == 2 * avg  # 2*avg is ALWAYS integral


@given(
    st.lists(st.integers(0, 30), min_size=2, max_size=120),
    st.lists(st.integers(0, 30), min_size=2, max_size=120),
)
@settings(max_examples=100, deadline=None)
def test_mannwhitney_protocol_matches_bruteforce_u(a, b):
    """U from the 2*avg-rank sum == the pairwise-comparison definition
    (wins + half-ties), on arbitrary tied integer samples."""
    r2 = _two_avg_ranks(a + b)
    two_r1 = sum(r2[v] for v in a)
    n1 = len(a)
    two_u1 = two_r1 - n1 * (n1 + 1)
    brute_2u = sum(
        2 if x > y else (1 if x == y else 0) for x in a for y in b
    )
    assert two_u1 == brute_2u


@given(
    st.lists(st.integers(0, 20), min_size=2, max_size=100),
    st.lists(st.integers(0, 20), min_size=2, max_size=100),
)
@settings(max_examples=100, deadline=None)
def test_auc_identity_holds_under_ties(pos, neg):
    """AUC = U/(n1*n2) equals the probabilistic definition with ties
    worth 1/2 — the identity q_auc_roc is built on."""
    r2 = _two_avg_ranks(pos + neg)
    two_r_pos = sum(r2[v] for v in pos)
    n1, n2 = len(pos), len(neg)
    auc = (two_r_pos - n1 * (n1 + 1)) / (2.0 * n1 * n2)
    brute = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    ) / (n1 * n2)
    assert abs(auc - brute) < 1e-12
    assert 0.0 <= auc <= 1.0


# --- containment threshold (q_shingle_containment)


@given(
    st.sets(st.integers(0, 60), min_size=1, max_size=40),
    st.sets(st.integers(0, 60), min_size=1, max_size=40),
)
@settings(max_examples=200, deadline=None)
def test_containment_cross_multiplication_equals_float(sa, sb):
    inter = len(sa & sb)
    int_decision = 10 * inter >= 8 * len(sa)
    float_decision = inter / len(sa) >= 0.8
    assert int_decision == float_decision or math.isclose(
        inter / len(sa), 0.8
    )  # boundary: integer compare is the exact one


# --- CUSUM scaling (q_cusum_changepoint)


@given(st.lists(st.integers(0, 1000), min_size=2, max_size=60))
@settings(max_examples=200, deadline=None)
def test_cusum_scaled_integer_tracks_float_cusum(ys):
    n, total = len(ys), sum(ys)
    mean = total / n
    int_c, float_c = 0, 0.0
    argmax_int, best_int = 0, -1
    argmax_flt, best_flt = 0, -1.0
    for i, y in enumerate(ys):
        int_c += n * y - total
        float_c += y - mean
        if abs(int_c) > best_int:
            best_int, argmax_int = abs(int_c), i
        if abs(float_c) > best_flt + 1e-9:
            best_flt, argmax_flt = abs(float_c), i
    # the integer cusum is exactly n * the float cusum -> same argmax
    assert argmax_int == argmax_flt
    # and the full-series cusum closes at exactly zero
    assert int_c == 0


# --- order-statistic percentile (q_winsorized_stats)


@given(st.lists(st.integers(-10_000, 10_000), min_size=1, max_size=300))
@settings(max_examples=200, deadline=None)
def test_order_statistic_cut_matches_sorted_index(values):
    s = sorted(values)
    n = len(s)
    for q_num in (5, 95):
        k = -(-q_num * n // 100)  # ceil(q*n/100)
        cut_by_index = s[k - 1]
        # the cumulative-count formulation used by the query
        c = Counter(values)
        cum = 0
        cut_by_cum = None
        for v in sorted(c):
            cum += c[v]
            if cum >= k:
                cut_by_cum = v
                break
        assert cut_by_cum == cut_by_index


# --- Kaplan-Meier integer log protocol (q_kaplan_meier)


@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.booleans()), min_size=2, max_size=80
    )
)
@settings(max_examples=100, deadline=None)
def test_km_integer_log_tracks_float_product(subjects):
    """Cumulative quantized-log survival stays within quantization error
    of the float KM product for arbitrary censoring patterns."""
    from collections import defaultdict

    by_t = defaultdict(lambda: [0, 0])
    for t, is_event in subjects:
        by_t[t][0 if is_event else 1] += 1
    n_remaining = len(subjects)
    int_log = 0
    float_s = 1.0
    steps = 0
    for t in sorted(by_t):
        d, c = by_t[t][0], by_t[t][1]
        n_risk = n_remaining
        if d > 0 and n_risk > d:
            int_log += round(1e6 * math.log(n_risk - d)) - round(
                1e6 * math.log(n_risk)
            )
            float_s *= 1 - d / n_risk
            steps += 1
            # each quantized log contributes <= 1e-6 error
            assert abs(int_log / 1e6 - math.log(float_s)) <= steps * 2e-6
        n_remaining -= d + c
        if n_remaining <= 0:
            break
