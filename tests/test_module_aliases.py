"""Drop-in import parity: every module a user can import from the
reference package (`/root/reference/datasketch/*.py`) must resolve under
``datasketch_tpu`` too, and the constant tables must match bit-for-bit."""

import importlib
import importlib.util
import pathlib

import pytest

REF_PKG = pathlib.Path("/root/reference/datasketch")

REFERENCE_MODULES = [
    "minhash",
    "lean_minhash",
    "weighted_minhash",
    "hyperloglog",
    "hyperloglog_const",
    "b_bit_minhash",
    "lsh",
    "lshforest",
    "lshensemble",
    "lshensemble_partition",
    "lsh_bloom",
    "hnsw",
    "hashfunc",
    "storage",
    "aio.lsh",
    "aio.storage",
    "experimental",
    "experimental.aio.lsh",
]


@pytest.mark.parametrize("mod", REFERENCE_MODULES)
def test_reference_submodule_importable(mod):
    assert REF_PKG.joinpath(*mod.split(".")).with_suffix(".py").exists() or (
        REF_PKG.joinpath(*mod.split(".")) / "__init__.py"
    ).exists(), f"reference lost {mod}? update this list"
    importlib.import_module(f"datasketch_tpu.{mod}")


def _load_reference_const():
    spec = importlib.util.spec_from_file_location(
        "_ref_hll_const", REF_PKG / "hyperloglog_const.py"
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def test_hyperloglog_const_bit_parity():
    ours = importlib.import_module("datasketch_tpu.hyperloglog_const")
    ref = _load_reference_const()
    assert ours._thresholds == list(ref._thresholds)
    assert len(ours._raw_estimate) == len(ref._raw_estimate) == 15
    for a, b in zip(ours._raw_estimate, ref._raw_estimate):
        assert list(a) == list(b)
    for a, b in zip(ours._bias, ref._bias):
        assert list(a) == list(b)


def test_lshensemble_partition_alias():
    mod = importlib.import_module("datasketch_tpu.lshensemble_partition")
    parts = mod.optimal_partitions([1, 2, 3, 4, 5, 6, 7, 8], [5, 4, 3, 2, 2, 3, 4, 5], 3)
    assert len(parts) == 3
    assert parts[0][0] == 1 and parts[-1][1] == 8
    # inclusive, contiguous intervals
    for (lo, hi), (lo2, _hi2) in zip(parts, parts[1:]):
        assert lo <= hi and lo2 == hi + 1
