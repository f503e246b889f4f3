"""The docs' headline fps must be ONE number, matching the newest
driver-measured BENCH_rNN.json (scripts/check_docs_numbers.py) — the
round-2/3 verdicts both flagged multiple conflicting fps claims
in-tree."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))

from check_docs_numbers import check  # noqa: E402


def test_docs_fps_headline_consistent():
    problems = check()
    assert not problems, "\n".join(problems)
