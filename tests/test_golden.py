"""Golden-vector regression gate (SURVEY.md §4): every pipeline stage must
reproduce the committed fixtures bit-for-bit (complex: to float32 exactness).

Regenerate intentionally with:  python tests/golden/generate.py
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "dl_chain.npz")


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="no fixtures")
def test_golden_dl_chain():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "golden_gen", os.path.join(os.path.dirname(__file__), "golden",
                                   "generate.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    got = mod.build()
    ref = np.load(GOLDEN)
    assert set(ref.files) == set(got.keys())
    for k in ref.files:
        g, r = np.asarray(got[k]), ref[k]
        assert g.shape == r.shape, k
        if np.issubdtype(r.dtype, np.integer):
            np.testing.assert_array_equal(g, r, err_msg=k)
        else:
            np.testing.assert_allclose(g, r, atol=1e-5, err_msg=k)
