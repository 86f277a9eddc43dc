"""QUERYBOOK.md must stay in sync with the registry and bench artifacts.

The book is a generated artifact (tools/make_querybook.py); a registry
edit, a demotion/promotion, a doc change, or a refreshed bench artifact
without a regeneration should fail HERE, not rot silently.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")


def test_querybook_in_sync():
    from make_querybook import render

    with open("/root/repo/QUERYBOOK.md") as f:
        checked_in = f.read()
    assert checked_in == render(), (
        "QUERYBOOK.md is stale — regenerate with: "
        "python tools/make_querybook.py"
    )


def test_querybook_covers_every_query():
    from railgun_spark import suite

    suite._ensure_loaded()
    with open("/root/repo/QUERYBOOK.md") as f:
        book = f.read()
    for name in list(suite.REGISTRY) + list(suite.EXTRA):
        assert f"`{name}`" in book, name
