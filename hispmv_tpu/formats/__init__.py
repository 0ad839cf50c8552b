from hispmv_tpu.formats.matrix import COOMatrix, coo_from_dense, coo_from_scipy  # noqa: F401
from hispmv_tpu.formats.mtx import load_mtx, save_mtx  # noqa: F401
