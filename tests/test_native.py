

def test_native_pseg_packer_matches_python():
    """The C++ PSEG round builder must reproduce the python greedy exactly."""
    import numpy as np

    from sblas import datasets, native
    from sblas.retile_pseg import pack_pseg
    from sblas.ops.kernels.spmv_pseg import hub_relabel

    if not native.have_native():
        import pytest

        pytest.skip("no native toolchain")
    a, _, _ = hub_relabel(
        datasets.emulate("uk-2002", scale=0.003, dtype=np.float32))
    wn = pack_pseg(a, cache=False)
    saved = native.pack_pseg_rounds
    native.pack_pseg_rounds = lambda *a_, **k_: None
    try:
        wp = pack_pseg(a, cache=False)
    finally:
        native.pack_pseg_rounds = saved
    assert wn.num_rounds == wp.num_rounds
    assert wn.n_stragglers == wp.n_stragglers
    np.testing.assert_array_equal(wn.val, wp.val)
    np.testing.assert_array_equal(wn.lcol, wp.lcol)
    np.testing.assert_array_equal(wn.tsb, wp.tsb)
    np.testing.assert_array_equal(wn.round_wrow, wp.round_wrow)
    np.testing.assert_array_equal(wn.round_oblk, wp.round_oblk)
