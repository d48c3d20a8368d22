"""tools/selfcheck must be tz-faithful: the driver gate hashes tz-aware
and naive timestamps differently (DuckDB ``to_timestamp()`` returns
TIMESTAMPTZ), and round 9 shipped a red driver row (``resample_grid``)
because selfcheck's normalizer stripped tzinfo and blessed an oracle the
driver failed.  These tests pin the fix: a deliberately tz-aware value
must NOT normalize equal to its naive twin."""

import importlib.util
import os
from datetime import datetime, timezone

_SPEC = importlib.util.spec_from_file_location(
    "selfcheck",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "selfcheck.py",
    ),
)
selfcheck = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(selfcheck)


def test_norm_distinguishes_tz_aware_from_naive():
    naive = datetime(2024, 1, 1, 12, 0, 0)
    aware = datetime(2024, 1, 1, 12, 0, 0, tzinfo=timezone.utc)
    assert selfcheck._norm(naive) != selfcheck._norm(aware)


def test_norm_still_order_insensitive_on_equal_values():
    a = datetime(2024, 1, 1, 12, 0, 0)
    b = datetime(2024, 1, 1, 12, 0, 0)
    assert selfcheck._norm(a) == selfcheck._norm(b)
    assert selfcheck._key((a, 1.0)) == selfcheck._key((b, 1.0))
