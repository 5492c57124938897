"""Plan-level documentation + assembly helpers.

The engine has no custom Catalyst rules (SURVEY.md §4: everything the
reference hand-optimizes maps onto stock DataFrame operators — filter
cascade ordering, bucket joins, AQE skew handling). This package holds
the plan-shape helpers and the explain-audit tool used to keep the
physical plans honest.
"""

from .audit import audit_plan

__all__ = ["audit_plan"]
