"""part_rank (integer PageRank) invariants beyond the oracle gate."""
import numpy as np

SF = "/root/testdata/sf0.01"


def test_part_rank_paths_agree_and_order(ray_session):
    """numpy driver fixpoint == forced co-bucketed distributed
    fixpoint, value for value (the whole point of the all-integer
    design); output is (rank desc, partkey asc) and capped at k."""
    from pdf_context_extractor_agent_ray.functions.graph import (
        PART_RANK_TOPK, part_rank)

    fast = part_rank(SF)
    fast = fast if not hasattr(fast, "to_pandas") else fast.to_pandas()
    slow = part_rank(SF, driver_max_lines=0).to_pandas() \
        .reset_index(drop=True)
    assert len(fast) and fast.reset_index(drop=True).equals(slow)
    assert len(fast) <= PART_RANK_TOPK
    key = list(zip(-fast["rank_score"], fast["l_partkey"]))
    assert key == sorted(key)
    assert (fast["rank_score"] > 0).all()


def test_part_rank_overflow_guard():
    """An adversarial rank/weight pair trips the loud int64 headroom
    guard instead of wrapping silently."""
    import pytest

    from pdf_context_extractor_agent_ray.functions.graph import (
        _check_headroom, _rank_numpy)

    with pytest.raises(ValueError, match="overflow"):
        _check_headroom(2 ** 60, 2 ** 10)

    # tiny triangle sanity: symmetric 3-cycle converges to equal ranks
    u = np.array([1, 2, 3, 2, 3, 1], np.int64)
    v = np.array([2, 3, 1, 1, 2, 3], np.int64)
    w = np.ones(6, np.int64)
    nodes, r = _rank_numpy(u, v, w)
    assert list(nodes) == [1, 2, 3]
    assert len(set(r.tolist())) == 1  # symmetry => identical ranks


def test_part_rank_mass_guard():
    """The a-priori accumulation bound trips loudly for node counts
    whose total mass cannot fit int64."""
    import pytest

    from pdf_context_extractor_agent_ray.functions.graph import (
        PART_RANK_ITERS, _check_mass)

    _check_mass(6_000_000_000, PART_RANK_ITERS)  # 100-TB scale: fits
    with pytest.raises(ValueError, match="total-mass"):
        _check_mass(10 ** 10, PART_RANK_ITERS)
