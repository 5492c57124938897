"""The committed spark-submit --py-files zip must match the source tree
byte-for-byte — a stale artifact ships outdated worker code (the README
documents `spark-submit --py-files cuda_selection_criteria_spark.zip`).
Regenerate with `python tools/make_pyfiles.py` whenever the package
changes; this test makes staleness a hard failure."""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "cuda_selection_criteria_spark"
ZIP = os.path.join(ROOT, f"{PKG}.zip")


def _tree_files():
    out = {}
    for dirpath, _dirs, files in os.walk(os.path.join(ROOT, PKG)):
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                with open(full, "rb") as f:
                    out[os.path.relpath(full, ROOT)] = f.read()
    return out


def test_pyfiles_zip_matches_source_tree():
    assert os.path.exists(ZIP), "run: python tools/make_pyfiles.py"
    tree = _tree_files()
    with zipfile.ZipFile(ZIP) as zf:
        names = set(zf.namelist())
        assert names == set(tree), (
            f"zip is stale: missing={set(tree) - names} "
            f"extra={names - set(tree)} — run tools/make_pyfiles.py"
        )
        for name, body in tree.items():
            assert zf.read(name) == body, f"zip is stale for {name}"
