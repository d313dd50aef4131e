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
    src = readme_perf.cited_source(text)
    assert src is not None, "README block must cite its BENCH source"
    # the block must be an exact regeneration from the file it cites
    # (comparing against the cited file, not the latest, keeps the test
    # green across the driver's end-of-round BENCH_r{N}.json commit)...
    assert readme_perf.apply(text, source=src) == text, (
        "README performance block is stale — run "
        "`python tools/readme_perf.py --write`")
    # ...while the freshness bound stops it rotting: the cited file must
    # be the latest or the immediately preceding capture
    names = readme_perf.bench_names()
    assert src in names[-2:], (
        f"README cites {src}, but newer benches exist: {names[-2:]} — "
        "run `python tools/readme_perf.py --write`")


def test_no_stale_inline_numbers():
    text = _readme()
    # retired values past verdicts caught being quoted as current
    for stale in ["316 tests", "827.5 frames/s", "BENCH_r03.json` —"]:
        assert stale not in text, f"stale README value: {stale!r}"
    # no hand-written test count anywhere (it changes every round)
    assert not re.search(r"\b\d{3}\s+tests\b", text)
