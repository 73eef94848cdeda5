"""Drop-in submodule alias: the reference exposes datasketch.b_bit_minhash
(users import it directly), so datasketch_tpu.b_bit_minhash forwards to
:mod:`datasketch_tpu.models.b_bit_minhash`."""

from datasketch_tpu.models.b_bit_minhash import *  # noqa: F401,F403
