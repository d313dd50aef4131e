"""README self-description can't drift from the recorded measurements.

Round-3 and round-4 verdicts both flagged stale inline numbers in
README.md; the fix is mechanical: the performance block is generated
from the latest ``BENCH_r*.json`` by ``tools/readme_perf.py`` and this
test fails whenever the committed README doesn't match a regeneration
(or quotes retired stale values inline).
"""

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

import readme_perf  # noqa: E402


def _readme():
    with open(os.path.join(ROOT, "README.md")) as f:
        return f.read()


def test_bench_block_is_current():
    text = _readme()
    assert readme_perf.apply(text) == text, (
        "README performance block is stale — run "
        "`python tools/readme_perf.py --write`")


def test_no_stale_inline_numbers():
    text = _readme()
    # retired values past verdicts caught being quoted as current
    for stale in ["316 tests", "827.5 frames/s", "BENCH_r03.json` —"]:
        assert stale not in text, f"stale README value: {stale!r}"
    # no hand-written test count anywhere (it changes every round)
    assert not re.search(r"\b\d{3}\s+tests\b", text)
