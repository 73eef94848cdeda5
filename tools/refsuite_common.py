"""Shared pieces of the run_reference_*_suite.py tools."""

from __future__ import annotations

import re


def rewrite(text: str) -> str:
    """Rewrite ``datasketch`` imports to ``datasketch_tpu`` (submodule
    aliases make them resolve). One copy — the three suite runners must
    apply identical rules or their results diverge."""
    text = re.sub(r"from datasketch\.", "from datasketch_tpu.", text)
    text = re.sub(r"import datasketch\.", "import datasketch_tpu.", text)
    text = re.sub(
        r"import datasketch\b(?!\.)", "import datasketch_tpu as datasketch",
        text,
    )
    text = re.sub(r"from datasketch ", "from datasketch_tpu ", text)
    text = re.sub(r"from test\.utils import", "from utils import", text)
    text = re.sub(r"from test\.utils", "from utils", text)
    return text
