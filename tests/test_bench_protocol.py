"""Pure-logic pins for bench.py's paired scaling protocol (no Ray)."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import _paired_median  # noqa: E402


def _p(eff, resumed=False):
    return {"eff": eff, "resumed": resumed}


def test_median_all_fresh_odd():
    assert _paired_median([_p(0.7), _p(0.9), _p(0.8)]) == 0.8


def test_median_all_fresh_even_averages():
    assert _paired_median([_p(0.7), _p(0.9)]) == 0.8


def test_resumed_pairs_excluded_when_fresh_exist():
    # ADVICE r3: a resumed pair's legs span different host windows; it
    # must not feed the median when back-to-back pairs exist
    pairs = [_p(0.2, resumed=True), _p(0.85), _p(0.95), _p(0.9),
             _p(2.0, resumed=True)]
    assert _paired_median(pairs) == 0.9


def test_all_resumed_falls_back_to_all():
    # degenerate: nothing fresh -> use what exists rather than crash
    pairs = [_p(0.6, resumed=True), _p(0.8, resumed=True),
             _p(0.7, resumed=True)]
    assert _paired_median(pairs) == 0.7


def test_missing_resumed_key_treated_as_fresh():
    # legacy records without the flag count as fresh
    assert _paired_median([{"eff": 0.75}, _p(0.5, resumed=True)]) == 0.75


def test_driver_window_is_exactly_50_entries():
    """The driver's correctness gate checks exactly the FIRST 50 entries
    of queries() (VERDICT r2 Next #1). r4 review caught the rotation
    leaving 51 entries above the window marker, silently pushing the
    51st (incremental_clusters) out of the gate — pin the count so a
    future rotation can't repeat it."""
    import re

    src = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__ray_entry__.py")).read()
    m = re.search(r"def queries\(\).*?\n    return \{", src, re.S)
    body = src[m.end():]
    marker = body.find("window ends here")
    assert marker != -1, "the 50-entry window marker comment is gone"
    in_window = re.findall(r'^\s+"([a-z0-9_]+)":', body[:marker], re.M)
    assert len(in_window) == 50, (len(in_window), in_window[-3:])
    assert len(in_window) == len(set(in_window))
