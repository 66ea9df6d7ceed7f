"""Quick-tier guard: README/STATUS headline numbers match bench artifacts.

VERDICT r4 #3 (number hygiene): every quoted benchmark value must be the
driver-captured artifact's value, machine-checked.  The logic lives in
``tools/check_bench_numbers.py``; this test runs it in-process so drift
fails CI, not just the standalone tool.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import check_bench_numbers  # noqa: E402


def test_headline_numbers_match_artifacts():
    errors = check_bench_numbers.check()
    assert not errors, "\n".join(errors)


def test_rounding_rules():
    assert check_bench_numbers.quoted_matches("109.1", 109.14)
    assert check_bench_numbers.quoted_matches("395", 395.15)
    assert check_bench_numbers.quoted_matches("739.6", 739.61)
    assert check_bench_numbers.quoted_matches("0.81", 0.8064)
    assert not check_bench_numbers.quoted_matches("119", 109.14)
    assert not check_bench_numbers.quoted_matches("154.0", 147.82)
