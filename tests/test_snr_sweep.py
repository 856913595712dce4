"""Config #2 gate: AWGN BLER behaves like a turbo waterfall — fails far
below threshold, clean above it (bench/snr_sweep.py harness)."""

import pytest

from bench.snr_sweep import sweep


@pytest.mark.slow
def test_bler_waterfall_position():
    tbs, scheme, res = sweep(n_rb=6, mcs=5, n_blocks=6, n_iter=6,
                             esn0_points=[-4.0, 3.0], seed=1)
    assert scheme == "qpsk"
    low, high = res[0], res[1]
    assert low[2] == 1.0, f"BLER at -4 dB should be 1.0, got {low[2]}"
    assert high[2] == 0.0, f"BLER at +3 dB should be 0.0, got {high[2]}"
    assert high[1] == 0.0  # BER exactly zero above threshold
