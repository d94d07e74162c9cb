"""Box-filter lowering tests: three strategies agree with a numpy oracle."""

import numpy as np
import pytest

from cnn_gp_tpu.ops import boxfilter


def numpy_box_filter(x, k, stride, pad, dilation):
    """Direct O(k^2) numpy oracle over the last two dims."""
    lo, hi = pad
    w_in, h_in = x.shape[-2:]
    w_out = boxfilter.out_size(w_in, k, stride, pad, dilation)
    h_out = boxfilter.out_size(h_in, k, stride, pad, dilation)
    xp = np.zeros(x.shape[:-2] + (w_in + lo + hi, h_in + lo + hi), x.dtype)
    xp[..., lo:lo + w_in, lo:lo + h_in] = x
    out = np.zeros(x.shape[:-2] + (w_out, h_out), x.dtype)
    for a in range(k):
        for b in range(k):
            out += xp[..., a * dilation:a * dilation + w_out * stride:stride,
                      b * dilation:b * dilation + h_out * stride:stride]
    return out


CASES = [
    dict(k=3, stride=1, padding="same", dilation=1),
    dict(k=7, stride=1, padding="same", dilation=1),
    dict(k=4, stride=1, padding="same", dilation=1),   # even-k asym padding
    dict(k=3, stride=2, padding="same", dilation=1),
    dict(k=4, stride=2, padding="same", dilation=1),
    dict(k=3, stride=1, padding=0, dilation=1),
    dict(k=5, stride=1, padding=2, dilation=2),
    dict(k=1, stride=2, padding=0, dilation=1),
    dict(k=10, stride=1, padding=0, dilation=1),       # full-map readout
]


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("method", ["separable", "direct", "matmul",
                                    "shifts"])
def test_box_filter_matches_oracle(case, method, rng):
    x = rng.randn(6, 10, 10).astype(np.float32)
    pad = boxfilter.resolve_padding(case["padding"], case["k"],
                                    case["dilation"])
    want = numpy_box_filter(x, case["k"], case["stride"], pad,
                            case["dilation"])
    got = np.asarray(boxfilter.box_filter_2d(
        x, case["k"], case["stride"], case["padding"], case["dilation"],
        method=method))
    assert got.shape == want.shape
    # fp32 summation-order differences only
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_even_same_padding_matches_reference_trick(ref_kernels, rng):
    """Even-kernel 'same': native asymmetric padding must equal the
    reference's enlarged-kernel-with-zero-row trick
    (reference: cnn_gp/kernels.py:73-88)."""
    import torch
    x = rng.randn(5, 1, 9, 9).astype(np.float32)
    for k in (2, 4, 6):
        ref_conv = ref_kernels.Conv2d(kernel_size=k)
        with torch.no_grad():
            import torch.nn.functional as F
            want = (F.conv2d(torch.from_numpy(x), ref_conv.kernel,
                             stride=1, padding=ref_conv.padding).numpy())
        got = np.asarray(boxfilter.box_filter_2d(
            x[:, 0], k, 1, "same", 1)) / (k * k)
        np.testing.assert_allclose(got, want[:, 0], rtol=1e-5, atol=1e-6)


def test_same_padding_values():
    assert boxfilter.same_padding(7, 1) == (3, 3)
    assert boxfilter.same_padding(3, 2) == (2, 2)
    assert boxfilter.same_padding(4, 1) == (1, 2)
    assert boxfilter.same_padding(4, 2) == (2, 4)


def test_out_size_same_preserves_length():
    for k in (2, 3, 4, 5, 7):
        pad = boxfilter.same_padding(k, 1)
        assert boxfilter.out_size(28, k, 1, pad, 1) == 28
        assert boxfilter.out_size(28, k, 2, pad, 1) == 14
