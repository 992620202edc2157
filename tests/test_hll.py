"""HyperLogLog sketch: estimator accuracy and the merge law the
distributed register aggregation relies on (register max is
associative/commutative, so ANY partial-aggregation tree is exact).
The register STATE itself is SQL-oracled via the hll_user_registers
query (test_query_oracle_parity)."""

from ferenda_ray.pipelines.queries import (
    HLL_P,
    _hll_rank_cols,
    hll_estimate,
)


def _registers(ids):
    regs: dict = {}
    for b, r in zip(*_hll_rank_cols(ids)):
        regs[b] = max(regs.get(b, 0), r)
    return regs


def test_hll_estimate_accuracy():
    # σ ≈ 1.04/√256 ≈ 6.5 % — assert a loose 3σ bound at two scales
    for n in (10_000, 100_000):
        est = hll_estimate(_registers(range(n)))
        assert abs(est - n) / n < 0.2, (n, est)


def test_hll_registers_merge_law():
    # merging per-partition registers by max == registers of the union
    whole = _registers(range(10_000))
    left = _registers(range(0, 5_000))
    right = _registers(range(5_000, 10_000))
    merged = dict(left)
    for b, r in right.items():
        merged[b] = max(merged.get(b, 0), r)
    assert merged == whole


def test_hll_duplicates_do_not_move_registers():
    ids = list(range(1_000))
    assert _registers(ids * 3) == _registers(ids)


def test_hll_rank_window():
    # ranks live in [1, 60 - HLL_P + 1]
    _, ranks = _hll_rank_cols(range(5_000))
    w = 60 - HLL_P
    assert min(ranks) >= 1 and max(ranks) <= w + 1


# --- Count-Min sketch (same sketch family, counters merge by sum) ----

from collections import Counter

from ferenda_ray.pipelines.queries import (
    CM_DEPTH,
    CM_WIDTH,
    _cm_col,
    cm_point_estimate,
)


def _cm_cells(stream):
    cells: dict = {}
    for u, n in Counter(stream).items():
        for r in range(CM_DEPTH):
            k = (r, _cm_col(r, u))
            cells[k] = cells.get(k, 0) + n
    return cells


def test_cm_never_underestimates():
    # zipf-ish stream: user u appears 1 + 1000 // (u + 1) times
    stream = [u for u in range(200) for _ in range(1 + 1000 // (u + 1))]
    cells = _cm_cells(stream)
    truth = Counter(stream)
    total = len(stream)
    for u, n in truth.items():
        est = cm_point_estimate(cells, u)
        assert est >= n  # one-sided guarantee
        # ε·N overflow bound with ε = e/width (loose, deterministic)
        assert est <= n + 3 * total / CM_WIDTH


def test_cm_cells_merge_by_sum():
    s1 = [u for u in range(100) for _ in range(3)]
    s2 = [u for u in range(50, 150) for _ in range(2)]
    whole = _cm_cells(s1 + s2)
    merged: dict = dict(_cm_cells(s1))
    for k, v in _cm_cells(s2).items():
        merged[k] = merged.get(k, 0) + v
    assert merged == whole
