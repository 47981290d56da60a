"""Band-pass Gaussian kernel golden values.

Vectors ported from /root/reference/tests/
band_pass_activity_profile_unit_tests.rs make_kernel_creation (epsilon
1e-3, matching the reference's relative_eq tolerance).
"""
import numpy as np
import pytest

from lorikeet_tpu.models.activity import gaussian_kernel


@pytest.mark.parametrize("sigma,max_size,expected", [
    (0.01, 1000, [1.0]),
    (1.0, 1000, [0.0001338302, 0.004431848, 0.053990966, 0.241970723,
                 0.398942278, 0.241970723, 0.053990966, 0.004431848,
                 0.0001338302]),
    (1.0, 0, [1.0]),
    (1.0, 1, [0.2740686, 0.4518628, 0.2740686]),
    (1.0, 2, [0.05448868, 0.24420134, 0.40261995, 0.24420134, 0.05448868]),
])
def test_kernel_creation(sigma, max_size, expected):
    kernel = gaussian_kernel(filter_size=max_size, sigma=sigma,
                             adaptive=True)
    assert len(kernel) == len(expected), kernel
    np.testing.assert_allclose(kernel, expected, atol=1e-3)


def test_default_kernel_sums_to_one_and_is_symmetric():
    k = gaussian_kernel()
    assert abs(k.sum() - 1.0) < 1e-12
    np.testing.assert_allclose(k, k[::-1])
