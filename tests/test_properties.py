"""Property-based tests (hypothesis) for driver-side pure kernels — the
randomized layer the reference's golden-output suite lacks (SURVEY.md §5)."""

from hypothesis import given, settings, strategies as st

from epic_pandas_spark.operators.sampling import allocate_counts
from epic_pandas_spark.operators.windows import gaussian_kernel


@given(
    st.dictionaries(
        st.integers(0, 50),
        st.floats(0.01, 100.0, allow_nan=False),
        min_size=1,
        max_size=20,
    ),
    st.integers(0, 10_000),
)
@settings(max_examples=200, deadline=None)
def test_allocate_counts_sums_to_n(dist, n):
    counts = allocate_counts(dist, n)
    assert sum(counts.values()) == n  # largest remainder never loses a row
    assert set(counts) == set(dist)
    assert all(v >= 0 for v in counts.values())


@given(st.integers(1, 10_000), st.integers(1, 100))
@settings(max_examples=200, deadline=None)
def test_allocate_counts_uniform_balance(n_strata_seed, n_rows):
    # uniform distribution: per-stratum counts differ by at most 1
    k = n_strata_seed % 20 + 1
    counts = allocate_counts({i: 1.0 for i in range(k)}, n_rows)
    assert max(counts.values()) - min(counts.values()) <= 1


@given(st.floats(0.1, 10.0, allow_nan=False), st.floats(0.5, 6.0, allow_nan=False))
@settings(max_examples=100, deadline=None)
def test_gaussian_kernel_normalized_symmetric(sigma, truncate):
    k = gaussian_kernel(sigma, truncate)
    assert abs(sum(k) - 1.0) < 1e-9
    assert len(k) % 2 == 1
    for a, b in zip(k, reversed(k)):
        assert abs(a - b) < 1e-12
    mid = len(k) // 2
    assert k[mid] == max(k)
