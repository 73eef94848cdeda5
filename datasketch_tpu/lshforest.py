"""Drop-in submodule alias: the reference exposes datasketch.lshforest
(users import it directly), so datasketch_tpu.lshforest forwards to
:mod:`datasketch_tpu.models.lshforest`."""

from datasketch_tpu.models.lshforest import *  # noqa: F401,F403
