"""MatrixMarket IO tests — contract of reference loadMtx
(common/src/spmv-helper.cpp:34-136)."""

import io

import numpy as np
import pytest

from hispmv_tpu.formats import load_mtx, save_mtx
from hispmv_tpu.formats.synth import random_coo


def _load_str(s):
    return load_mtx(io.StringIO(s))


def test_general_real():
    m = _load_str(
        """%%MatrixMarket matrix coordinate real general
% comment line
3 4 3
1 1 2.5
3 4 -1.0
2 2 7
"""
    )
    assert m.shape == (3, 4)
    assert m.nnz == 3
    dense = m.to_dense()
    assert dense[0, 0] == 2.5
    assert dense[2, 3] == -1.0
    assert dense[1, 1] == 7.0


def test_pattern():
    m = _load_str(
        """%%MatrixMarket matrix coordinate pattern general
2 2 2
1 2
2 1
"""
    )
    assert np.all(m.values == 1.0)
    assert m.nnz == 2


def test_symmetric_expansion():
    m = _load_str(
        """%%MatrixMarket matrix coordinate real symmetric
3 3 3
1 1 1.0
2 1 2.0
3 2 3.0
"""
    )
    dense = m.to_dense()
    assert m.nnz == 5  # 3 entries + 2 mirrored off-diagonals
    assert dense[0, 1] == 2.0 and dense[1, 0] == 2.0
    assert dense[1, 2] == 3.0 and dense[2, 1] == 3.0
    assert dense[0, 0] == 1.0


def test_skew_symmetric_negates():
    m = _load_str(
        """%%MatrixMarket matrix coordinate real skew-symmetric
2 2 1
2 1 4.0
"""
    )
    dense = m.to_dense()
    assert dense[1, 0] == 4.0
    assert dense[0, 1] == -4.0


def test_explicit_zeros_dropped():
    m = _load_str(
        """%%MatrixMarket matrix coordinate real general
2 2 2
1 1 0.0
2 2 5.0
"""
    )
    assert m.nnz == 1


def test_integer_field():
    m = _load_str(
        """%%MatrixMarket matrix coordinate integer general
2 2 1
1 2 -3
"""
    )
    assert m.to_dense()[0, 1] == -3.0


def test_rejects_bad_banner():
    with pytest.raises(ValueError):
        _load_str("not a banner\n1 1 0\n")


def test_rejects_array_format():
    with pytest.raises(ValueError):
        _load_str("%%MatrixMarket matrix array real general\n2 2\n1\n2\n3\n4\n")


def test_roundtrip(tmp_path):
    m = random_coo(50, 70, 400, seed=9)
    path = str(tmp_path / "rt.mtx")
    save_mtx(path, m)
    m2 = load_mtx(path)
    np.testing.assert_allclose(m2.to_dense(), m.to_dense(), rtol=1e-6)


def test_matches_scipy_loader(tmp_path):
    import scipy.io as sio

    m = random_coo(64, 64, 500, seed=11)
    path = str(tmp_path / "sc.mtx")
    save_mtx(path, m)
    ours = load_mtx(path).to_dense()
    theirs = np.asarray(sio.mmread(path).todense(), dtype=np.float32)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)
