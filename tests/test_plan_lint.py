"""Registry-wide plan lint: every registered query's physical plan is
free of unbounded joins, undeclared Python nodes, and undesigned global
sorts. The allowlists in tools/plan_lint.py carry per-query
justifications; a new query that trips this test either fixes its plan
or documents why it belongs on a list."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")

from plan_lint import lint_registry  # noqa: E402


def test_every_registered_plan_is_scale_clean(spark):
    violations = lint_registry(spark)
    assert violations == []
