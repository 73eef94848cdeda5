"""Pipelining, upload, and profiling utilities."""

import numpy as np
import pytest

from datasketch_tpu.ops.transfer import device_upload
from datasketch_tpu.utils import device_sync, time_op
from datasketch_tpu.utils.pipeline import stream_batches


def test_stream_batches_order_and_depth():
    events = []

    def dispatch(b):
        events.append(("d", b))
        return b * 10

    def finish(out):
        events.append(("f", out // 10))
        return out + 1

    results = list(stream_batches(range(6), dispatch, finish, depth=3))
    assert results == [1, 11, 21, 31, 41, 51]
    # first finish must wait until `depth` dispatches are in flight
    assert events[:4] == [("d", 0), ("d", 1), ("d", 2), ("f", 0)]
    # every batch is finished exactly once, in order
    assert [e[1] for e in events if e[0] == "f"] == list(range(6))


def test_stream_batches_drains_short_input():
    # fewer batches than depth: everything still comes out
    out = list(stream_batches([1, 2], lambda b: b, lambda o: o, depth=8))
    assert out == [1, 2]
    assert list(stream_batches([], lambda b: b, lambda o: o)) == []


def test_stream_batches_rejects_bad_depth():
    with pytest.raises(ValueError):
        list(stream_batches([1], lambda b: b, lambda o: o, depth=0))


def test_stream_batches_starts_async_copies():
    class FakeDeviceArray:
        def __init__(self):
            self.copied = False

        def copy_to_host_async(self):
            self.copied = True

    arrays = [FakeDeviceArray() for _ in range(3)]
    it = iter(arrays)
    gen = stream_batches(range(3), lambda b: next(it), lambda o: o, depth=3)
    first = next(gen)
    # dispatch of all three ran before the first finish; copies started
    # eagerly at dispatch time, not at finish time
    assert first is arrays[0]
    assert all(a.copied for a in arrays)


@pytest.mark.parametrize("n", [5, 64, 100])
def test_device_upload_round_trip(n):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 2**31, size=(n, 7), dtype=np.int32)
    # tiny chunk_bytes forces the chunked dynamic_update_slice path
    dev = device_upload(arr, chunk_bytes=7 * 4 * 16)
    assert dev.shape == (n, 7)
    np.testing.assert_array_equal(np.asarray(dev), arr)


def test_device_upload_small_array_fast_path():
    arr = np.arange(12, dtype=np.uint32).reshape(3, 4)
    np.testing.assert_array_equal(np.asarray(device_upload(arr)), arr)


def test_device_upload_rejects_non_2d():
    with pytest.raises(ValueError):
        device_upload(np.arange(5))


def test_device_sync_handles_mixed_pytree():
    import jax.numpy as jnp

    device_sync(
        {
            "f": jnp.ones((3,)),
            "b": jnp.asarray([True, False]),
            "empty": jnp.zeros((0,)),
            "static": 7,
        }
    )


def test_time_op_returns_output_and_positive_time():
    import jax.numpy as jnp

    best, out = time_op(lambda x: jnp.sum(x) * 2, jnp.arange(8.0), iters=2)
    assert best >= 0.0
    assert float(out) == 56.0


def test_persist_helpers_round_trip():
    from datasketch_tpu.persist import npz_path, pack_keys, unpack_keys

    assert npz_path("x") == "x.npz"
    assert npz_path("x.npz") == "x.npz"
    for keys in ([1, "a", ("t", 2)], [], [None, b"bytes"], {"n": [1, 2]}):
        arr = pack_keys(keys)
        assert arr.dtype == np.uint8 and arr.ndim == 1
        assert unpack_keys(arr) == keys


def test_atomic_savez_replaces_never_tears(tmp_path):
    import numpy as np

    from datasketch_tpu.persist import atomic_savez, npz_path

    path = str(tmp_path / "ckpt")
    atomic_savez(path, a=np.arange(4))
    good = open(npz_path(path), "rb").read()
    # a failing second write must leave the original intact and no temp
    class Boom(Exception):
        pass

    import numpy as _np

    orig = _np.savez_compressed

    def boom(f, **kw):
        f.write(b"partial garbage")
        raise Boom()

    _np.savez_compressed = boom
    try:
        import pytest as _pytest

        with _pytest.raises(Boom):
            atomic_savez(path, a=np.arange(8))
    finally:
        _np.savez_compressed = orig
    assert open(npz_path(path), "rb").read() == good
    leftovers = [p for p in tmp_path.iterdir() if ".tmp-" in p.name]
    assert not leftovers
