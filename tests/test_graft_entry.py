"""The driver hooks must keep working: entry() compiles and runs single-chip."""

import sys

import jax
import numpy as np

sys.path.insert(0, "/root/repo")


def test_entry_is_jittable():
    import __graft_entry__ as ge

    fn, (pc, obj_id) = ge.entry()
    out = jax.jit(fn)(pc, obj_id)
    p_green, p_red, f_green, f_red, pred_T, pred_s = out
    assert p_green.shape == (pc.shape[0], 3)
    assert pred_T.shape == (pc.shape[0], 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(p_green), axis=-1), 1.0,
                               atol=1e-4)
    assert np.all(np.isfinite(np.asarray(pred_s)))
