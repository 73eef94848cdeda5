"""Pallas signature kernel parity (interpret mode on the CPU test mesh)."""

import numpy as np
import pytest

from datasketch_tpu.ops import minhash_ops, pallas_kernels


@pytest.mark.parametrize("b,t,p", [(8, 128, 128), (32, 256, 128), (16, 128, 256)])
def test_pallas_matches_scan_bit_exact(b, t, p):
    rng = np.random.RandomState(b + t)
    hashes = rng.randint(0, 1 << 32, size=(b, t), dtype=np.uint64).astype(np.uint32)
    lengths = rng.randint(0, t + 1, size=(b,)).astype(np.int32)
    limbs = [np.asarray(x) for x in minhash_ops.perm_limbs(1, p)]
    want = np.asarray(minhash_ops.compute_signatures(hashes, lengths, 1, p))
    got = np.asarray(
        pallas_kernels.sign_batch_pallas(hashes, lengths, *limbs, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_empty_rows_stay_max_hash():
    b, t, p = 8, 128, 128
    hashes = np.zeros((b, t), dtype=np.uint32)
    lengths = np.zeros((b,), dtype=np.int32)
    limbs = [np.asarray(x) for x in minhash_ops.perm_limbs(1, p)]
    got = np.asarray(
        pallas_kernels.sign_batch_pallas(hashes, lengths, *limbs, interpret=True)
    )
    assert (got == 0xFFFFFFFF).all()


def test_pallas_shape_validation():
    limbs = [np.asarray(x) for x in minhash_ops.perm_limbs(1, 128)]
    with pytest.raises(ValueError):
        pallas_kernels.sign_batch_pallas(
            np.zeros((7, 128), np.uint32), np.zeros(7, np.int32), *limbs,
            interpret=True,
        )
