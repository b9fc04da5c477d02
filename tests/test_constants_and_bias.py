"""Constants, sigma and bias-correction golden tests (FIXTURES.md F4).

Reference: HllConstantsTests.cs:33-123, BiasCorrectionTests.cs:32-80,
CardinalityEstimatorTests.cs:60-70.
"""

import numpy as np
import pytest

from cardinalityestimation_ray.sketches import constants
from cardinalityestimation_ray.sketches.bias import correct_bias
from cardinalityestimation_ray.sketches.bias_tables import BIAS_DATA, RAW_ESTIMATE
from cardinalityestimation_ray.sketches.hll import HyperLogLog, get_sigma


def test_alpha_m():
    assert constants.get_alpha_m(16) == 0.673
    assert constants.get_alpha_m(32) == 0.697
    assert constants.get_alpha_m(64) == 0.709
    for m in (128, 1 << 14, 1 << 16):
        assert constants.get_alpha_m(m) == pytest.approx(0.7213 / (1 + 1.079 / m))


def test_sub_algorithm_selection_threshold():
    expected = {4: 10, 5: 20, 6: 40, 7: 80, 8: 220, 9: 400, 10: 900, 11: 1800,
                12: 3100, 13: 6500, 14: 11500, 15: 20000, 16: 50000,
                17: 120000, 18: 350000}
    for b, v in expected.items():
        assert constants.get_sub_algorithm_selection_threshold(b) == v
    with pytest.raises(ValueError):
        constants.get_sub_algorithm_selection_threshold(3)


def test_inverse_powers_of_two():
    assert len(constants.INVERSE_POWERS_OF_TWO) == 65
    for i in (0, 1, 5, 32, 64):
        assert constants.INVERSE_POWERS_OF_TWO[i] == 2.0 ** -i


def test_direct_counter_max():
    assert constants.DIRECT_COUNTER_MAX_ELEMENTS == 100


def test_bits_validation():
    for b in (3, 17, -1, 0):
        with pytest.raises(ValueError):
            HyperLogLog(b=b)
    for b in (4, 16):
        HyperLogLog(b=b)


def test_sparse_max_elements():
    # max(0, m/15 - 10); b <= 7 is dense from construction
    assert constants.sparse_max_elements(1 << 4) == 0
    assert constants.sparse_max_elements(1 << 7) == 0
    assert constants.sparse_max_elements(1 << 8) == (1 << 8) // 15 - 10
    assert constants.sparse_max_elements(1 << 14) == (1 << 14) // 15 - 10
    for b in (4, 7):
        assert not HyperLogLog(b=b).is_sparse
    for b in (8, 14):
        assert HyperLogLog(b=b).is_sparse


def test_get_sigma_golden():
    # CardinalityEstimatorTests.cs:60-70 (bitsToCount = 50)
    assert get_sigma(0, 50) == 51
    assert get_sigma(1, 50) == 50
    assert get_sigma(8, 50) == 47
    assert get_sigma((1 << 50) - 1, 50) == 1
    assert get_sigma(1 << 51, 50) == 51


def test_bias_correction_golden_b4():
    # BiasCorrectionTests.cs:32-68
    assert correct_bias(12.207, 4) == pytest.approx(3.0)
    assert correct_bias(11.1, 4) == pytest.approx(1.1394700139470011)
    assert correct_bias(78.0, 4) == pytest.approx(78.0 + 1.7606)
    assert correct_bias(10.5, 4) == pytest.approx(0.5)
    assert correct_bias(5.0, 4) == 0.0


def test_bias_tables_pairwise_consistent():
    # BiasCorrectionTests.cs:70-80: precisions 4..18, pairwise equal lengths
    assert sorted(RAW_ESTIMATE) == list(range(4, 19))
    assert sorted(BIAS_DATA) == list(range(4, 19))
    for p in RAW_ESTIMATE:
        assert len(RAW_ESTIMATE[p]) == len(BIAS_DATA[p]) > 0


def test_std_error():
    assert constants.std_error(14) == pytest.approx(1.04 / np.sqrt(1 << 14))
