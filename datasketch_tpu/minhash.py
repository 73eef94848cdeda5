"""Drop-in submodule alias: the reference exposes datasketch.minhash
(users import it directly), so datasketch_tpu.minhash forwards to
:mod:`datasketch_tpu.models.minhash`."""

from datasketch_tpu.models.minhash import *  # noqa: F401,F403
