"""CLI (spmv-host analog) and metrics CSV tests."""

import numpy as np

from hispmv_tpu.cli import main
from hispmv_tpu.utils.metrics import read_metrics


def test_cli_synthetic_suite(tmp_path):
    csv = str(tmp_path / "m.csv")
    rc = main(
        ["@poli_large:0.5", "--format", "tune", "--no-bench",
         "--metrics-csv", csv,
         "--tune-cache", str(tmp_path / "cache.json")]
    )
    assert rc == 0
    rows = read_metrics(csv)
    assert len(rows) == 1
    assert rows[0]["verified"] == "True"
    assert int(rows[0]["nnz"]) > 0


def test_cli_dense_mode(tmp_path):
    rc = main(["64", "96", "--no-bench"])
    assert rc == 0


def test_cli_mtx_file(tmp_path):
    from hispmv_tpu.formats import save_mtx
    from hispmv_tpu.formats.synth import random_coo

    p = str(tmp_path / "a.mtx")
    save_mtx(p, random_coo(60, 50, 400, seed=1))
    rc = main([p, "--no-bench", "--format", "window"])
    assert rc == 0


def test_cli_alpha(tmp_path):
    rc = main(["@poli_large:0.3", "--no-bench", "--alpha", "2.5"])
    assert rc == 0
