"""Convenience submodule alias: the device-resident classes live under
:mod:`datasketch_tpu.models.tpu_ensemble` (TPU-native additions with no
reference analogue); this alias keeps import paths flat alongside the
drop-in parity modules."""

from datasketch_tpu.models.tpu_ensemble import *  # noqa: F401,F403
