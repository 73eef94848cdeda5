"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's guidance — multi-device behavior is exercised with
``--xla_force_host_platform_device_count`` as the fake-backend analogue of
the reference's mocked Redis.

Note: this environment pre-imports jax at interpreter startup (sitecustomize
registers the TPU tunnel), so env vars alone are too late — we must flip the
platform via jax.config before any backend is resolved.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Subprocess device probes (utils/health.py) must not touch the real TPU
# tunnel from the test suite either.
os.environ["DATASKETCH_TPU_PROBE_PLATFORM"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# Paths gated on a real TPU, and how CPU CI covers (or cannot cover) their
# logic. Printed at the end of every run so a wedged-tunnel round can never
# SILENTLY ship untested device code (VERDICT r2 item 7): anything listed
# here without an interpret-mode twin needs a real-TPU run before release.
DEVICE_ONLY_PATHS = [
    (
        "ops/pallas_kernels.py sign_batch_pallas (Mosaic compile+exec)",
        "logic bit-parity via interpret=True in test_pallas_kernels.py / "
        "test_device_hash.py; Mosaic compile itself needs a TPU",
    ),
    (
        "ops/pallas_kernels.py score_matrix/rerank_scores (Mosaic)",
        "interpret-mode parity + forced-integration tests "
        "(SCORE_KERNEL_INTERPRET knob) in test_pallas_kernels.py",
    ),
    (
        "ops/pallas_kernels.py cws_many_pallas (Mosaic CWS)",
        "interpret-mode parity vs cws_many + forced cws_many_best branch "
        "(CWS_KERNEL_INTERPRET knob) in test_pallas_kernels.py",
    ),
    (
        "ops/pallas_kernels.py bbit_scores_pallas (Mosaic packed scan)",
        "interpret-mode parity vs bbit_ops.match_counts at every slot "
        "size + forced bbit_topk_scan branch in test_pallas_kernels.py",
    ),
    (
        "ops/lsh_ops.py topk_scan/rerank_jaccard Pallas branch",
        "forced via SCORE_KERNEL_INTERPRET in test_pallas_kernels.py; "
        "platform gate keeps it off elsewhere in CPU CI",
    ),
    (
        "axon tunnel behavior (~50MB/s H2D, speculative dispatch "
        "completion, ~30ms RTT, wedge modes)",
        "NOT coverable off-TPU; utils/health.py probe logic tested with "
        "DATASKETCH_TPU_PROBE_PLATFORM=cpu",
    ),
]


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    if jax.devices()[0].platform == "tpu":  # pragma: no cover
        return
    terminalreporter.write_sep("-", "device-only coverage (CPU backend run)")
    terminalreporter.write_line(
        "native-TPU paths NOT executed this run (%d) and their CPU-CI "
        "coverage:" % len(DEVICE_ONLY_PATHS)
    )
    for path, how in DEVICE_ONLY_PATHS:
        terminalreporter.write_line("  * %s\n      -> %s" % (path, how))
