"""Property tests for the late-r4 integer-exact formulations: the
cross-engine determinism of these operators rests on algebraic
identities (division/sqrt/log cleared from comparisons) — these pin the
identities themselves, independent of Spark and DuckDB.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


# --- anomalias_trafico: (x·n − s)² > 9·(n·q − s²) ⟺ z > 3 ---------------

@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=7, max_size=7),
    st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=300, deadline=None)
def test_anomaly_integer_test_equals_float_z(window, x):
    n = len(window)
    s = sum(window)
    q = sum(v * v for v in window)
    desvio = x * n - s
    integer_flag = desvio > 0 and desvio * desvio > 9 * (n * q - s * s)
    var_pop = (n * q - s * s) / (n * n)
    if var_pop <= 0:
        float_flag = x * n - s > 0  # zero variance: any positive deviation
        # integer side: desvio² > 0 ⟺ desvio != 0, with desvio > 0 gated
        assert integer_flag == float_flag
        return
    z = (x - s / n) / math.sqrt(var_pop)
    # strict inequality on both sides; floats can only disagree within
    # rounding of the EXACT integer comparison, so check against the
    # integer truth, allowing the float z to sit on the boundary
    if abs(z - 3.0) > 1e-9:
        assert integer_flag == (z > 3.0)


# --- BM25: log2-quantized idf ladder == floor(log2) ---------------------

def _floor_log2_case(x: int) -> int:
    for p in range(31, 0, -1):
        if x >= 1 << p:
            return p
    return 0


@given(st.integers(min_value=1, max_value=2**40))
@settings(max_examples=300, deadline=None)
def test_case_ladder_is_floor_log2(x):
    expect = x.bit_length() - 1
    assert _floor_log2_case(x) == min(expect, 31)


@given(
    st.integers(min_value=1, max_value=200),      # tf
    st.integers(min_value=1, max_value=2000),     # dl
    st.integers(min_value=1000, max_value=2_000_000),  # avgdl_mili
)
@settings(max_examples=300, deadline=None)
def test_bm25_tf_component_saturates(tf, dl, avgdl_mili):
    """The milli-unit tf component stays within BM25's structural
    bounds: positive, at most (k1+1)·1000, and nondecreasing in tf."""
    K1, B = 1200, 750

    def comp(t):
        denom = t * 1000 + (K1 * (1000 - B + (B * dl * 1000) // avgdl_mili)) // 1000
        return (t * (K1 + 1000) * 1000) // denom

    c = comp(tf)
    assert 0 < c <= (K1 + 1000) * 1000 // 1000 * 1000  # ≤ 2.2e6 milli
    assert comp(tf + 1) >= c  # saturating, never decreasing


# --- EWMA fold: bounded by the series envelope --------------------------

@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1,
                max_size=50))
@settings(max_examples=300, deadline=None)
def test_ewma_fold_bounded_by_envelope(xs):
    mili = [x * 1000 for x in xs]
    s = mili[0]
    for x in mili[1:]:
        s = (300 * x + 700 * s) // 1000
    # floor division loses < 1 milli-unit per step
    assert min(mili) - len(mili) <= s <= max(mili)


# --- PQ codes: argmin always lands in [0, K) and reconstruction ---------

@given(
    st.lists(st.lists(st.integers(min_value=-10**6, max_value=10**6),
                      min_size=8, max_size=8), min_size=1, max_size=16),
    st.lists(st.integers(min_value=-10**6, max_value=10**6),
             min_size=8, max_size=8),
)
@settings(max_examples=200, deadline=None)
def test_pq_argmin_tiebreak_is_lowest_j(codebook, v):
    d2s = [sum((a - b) * (a - b) for a, b in zip(v, cw)) for cw in codebook]
    best = min(range(len(codebook)), key=lambda j: (d2s[j], j))
    # the Spark fold replaces only on STRICTLY smaller d2 → lowest j wins ties
    acc = (None, 2**63 - 1)
    for j, d2 in enumerate(d2s):
        if d2 < acc[1]:
            acc = (j, d2)
    assert acc[0] == best


# --- KMV: bottom-(K+1) set decides exact-vs-estimate correctly ----------

@given(st.sets(st.integers(min_value=1, max_value=2**60 - 1), min_size=1,
               max_size=200))
@settings(max_examples=200, deadline=None)
def test_kmv_bottom_k_plus_one_distinguishes_exact(hashes):
    K = 64
    trimmed = sorted(hashes)[: K + 1]
    if len(trimmed) <= K:
        assert len(trimmed) == len(hashes)  # we saw EVERY distinct value
    else:
        assert len(hashes) > K  # truncation ⟺ more than K distincts exist


# --- prueba_ab: 625·N·(c₁n₂−c₂n₁)² > 2401·n₁n₂·c·(N−c) ⟺ z² > 3.8416 ----

@given(
    st.integers(min_value=1, max_value=10**5),
    st.integers(min_value=1, max_value=10**5),
    st.data(),
)
@settings(max_examples=300, deadline=None)
def test_ab_integer_test_equals_float_z(n1, n2, data):
    c1 = data.draw(st.integers(min_value=0, max_value=n1))
    c2 = data.draw(st.integers(min_value=0, max_value=n2))
    n_tot, c = n1 + n2, c1 + c2
    integer_flag = (
        0 < c < n_tot
        and 625 * n_tot * (c1 * n2 - c2 * n1) ** 2
        > 2401 * n1 * n2 * c * (n_tot - c)
    )
    if c == 0 or c == n_tot:
        assert integer_flag is False  # degenerate: zero pooled variance
        return
    p1, p2, p = c1 / n1, c2 / n2, c / n_tot
    z2 = (p1 - p2) ** 2 / (p * (1 - p) * (1 / n1 + 1 / n2))
    # strict inequality both sides; only boundary-rounding can differ
    if abs(z2 - 3.8416) > 1e-9:
        assert integer_flag == (z2 > 3.8416)


# --- sketch_hll_registros: rho ladder == leading zeros + 1, capped ------

@given(st.integers(min_value=0, max_value=2**54 - 1))
@settings(max_examples=300, deadline=None)
def test_hll_rho_ladder_is_leading_zero_count(rest):
    from etl_python_airflow_bigquery_spark.queries.extras import (
        _HLL_RHO_CAP,
        _hll_rho_sql,
    )

    # evaluate the generated CASE ladder in pure Python
    expect = min(55 - rest.bit_length() if rest else 55, _HLL_RHO_CAP)
    got = _HLL_RHO_CAP
    for k in range(1, _HLL_RHO_CAP):
        if rest >= 1 << (54 - k):
            got = k
            break
    assert got == expect
    # and the ladder text contains exactly the bounds the loop used
    sql = _hll_rho_sql("x")
    assert f"WHEN x >= {1 << 53} THEN 1" in sql
    assert sql.strip().endswith(f"ELSE {_HLL_RHO_CAP} END)")


# --- gini_consumo: rank formulation == mean-absolute-difference ----------

@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1,
                max_size=60))
@settings(max_examples=200, deadline=None)
def test_gini_rank_form_equals_pairwise_definition(xs):
    total = sum(xs)
    if total == 0:
        return
    n = len(xs)
    xs_sorted = sorted(xs)
    # engine form: floor-milli of (2·Σ i·xᵢ)/(n·Σx) − (n+1)/n
    num = 2000 * sum((i + 1) * x for i, x in enumerate(xs_sorted)) \
        - 1000 * (n + 1) * total
    gini_mili = num // (n * total)
    # textbook: G = Σᵢⱼ|xᵢ−xⱼ| / (2n²·mean) — exact rational comparison
    mad = sum(abs(a - b) for a in xs for b in xs)
    # gini_mili == floor(1000 · mad·n / (2n²·total/n)) = floor(1000·mad/(2n·total))
    assert gini_mili == (1000 * mad) // (2 * n * total)


# --- pronostico_holt: floor-div identity + fold == reference recurrence --

def _fd_py(a: int) -> int:
    return (a - ((a % 1000) + 1000) % 1000) // 1000


@given(st.integers(min_value=-10**12, max_value=10**12))
@settings(max_examples=300, deadline=None)
def test_floor_div_identity_is_true_floor(a):
    # the shared SQL identity: subtract positive modulus, then divide —
    # equals mathematical floor division for any sign
    assert _fd_py(a) == a // 1000
    # and the adjusted numerator is exactly divisible, which is why
    # Spark's truncating `div` and DuckDB's flooring `//` agree on it
    assert (a - ((a % 1000) + 1000) % 1000) % 1000 == 0


@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1,
                max_size=50))
@settings(max_examples=200, deadline=None)
def test_holt_fold_tracks_float_holt(ys):
    # the integer recurrence vs textbook float Holt: each step floors
    # twice (≤ 1 milli each), and the filter is stable (coefficients sum
    # < 1), so accumulated drift stays O(n) milli — NOT the envelope
    # bound (trend extrapolation legitimately overshoots min/max, e.g.
    # a rising 0→1 series ends above 1000)
    l, b = ys[0] * 1000, 0
    fl, fb = float(ys[0] * 1000), 0.0
    for y in ys[1:]:
        ym = y * 1000
        l2 = _fd_py(300 * ym + 700 * (l + b))
        b = _fd_py(100 * (l2 - l) + 900 * b)
        l = l2
        fl2 = 0.3 * ym + 0.7 * (fl + fb)
        fb = 0.1 * (fl2 - fl) + 0.9 * fb
        fl = fl2
    n = len(ys)
    assert abs(l - fl) <= 10 * n + 10
    assert abs(b - fb) <= 10 * n + 10


def test_holt_constant_series_is_exact():
    for c in (0, 1, 7, 10**6):
        l, b = c * 1000, 0
        for _ in range(30):
            l2 = _fd_py(300 * c * 1000 + 700 * (l + b))
            b = _fd_py(100 * (l2 - l) + 900 * b)
            l = l2
        assert (l, b) == (c * 1000, 0)


# --- correlacion_tipos: cleared inequality == |r| > 0.5 ------------------

@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**4),
                  st.integers(min_value=0, max_value=10**4)),
        min_size=2, max_size=40,
    )
)
@settings(max_examples=300, deadline=None)
def test_correlation_integer_test_equals_float_r(pairs):
    n = len(pairs)
    sa = sum(x for x, _ in pairs); sb = sum(y for _, y in pairs)
    sab = sum(x * y for x, y in pairs)
    saa = sum(x * x for x, _ in pairs); sbb = sum(y * y for _, y in pairs)
    cov = n * sab - sa * sb
    va = n * saa - sa * sa; vb = n * sbb - sb * sb
    integer_flag = 4 * cov * cov > va * vb
    if va == 0 or vb == 0:
        # a constant series: r undefined; the cleared form says
        # 4cov² > 0 ⟺ cov ≠ 0, and cov = 0 when either side is constant
        assert cov == 0 and integer_flag is False
        return
    r = cov / (va ** 0.5 * vb ** 0.5)
    if abs(abs(r) - 0.5) > 1e-9:
        assert integer_flag == (abs(r) > 0.5)


# --- retraso_envios: 1/(1−q)-scaled type-7 quantiles are integers --------

@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1,
                max_size=80), st.sampled_from([(2, 0.5), (20, 0.95)]))
@settings(max_examples=300, deadline=None)
def test_scaled_type7_quantile_is_integer(xs, scale_q):
    from fractions import Fraction

    scale, q = scale_q
    xs = sorted(xs)
    n = len(xs)
    pos = Fraction(q).limit_denominator(100) * (n - 1)
    lo = xs[int(pos)]
    hi = xs[min(int(pos) + 1, n - 1)]
    frac = pos - int(pos)
    exact = Fraction(lo) + frac * (hi - lo)
    scaled = scale * exact
    # the scaled type-7 quantile is an integer BY CONSTRUCTION — the
    # interpolation weight's denominator divides the scale
    assert scaled.denominator == 1


# --- colocaciones_pmi: two-sided ladder == floor(log2(num/den)) ----------

@given(st.integers(min_value=1, max_value=10**7),
       st.integers(min_value=1, max_value=10**7))
@settings(max_examples=300, deadline=None)
def test_pmi_two_sided_ladder_is_floor_log2_ratio(num, den):
    def ladder(n, d, lo=-8, hi=8):
        for k in range(hi, lo - 1, -1):
            if k >= 0:
                if n >= d * (1 << k):
                    return k
            else:
                if n * (1 << (-k)) >= d:
                    return k
        return lo - 1

    # exact floor via integers (no float log): largest k with 2^k <= n/d
    t = -9
    for k in range(8, -9, -1):
        ok = num >= den * (1 << k) if k >= 0 else num * (1 << (-k)) >= den
        if ok:
            t = k
            break
    import math
    expect = max(min(math.floor(math.log2(num / den)), 8), -9)
    assert ladder(num, den) == t == expect
