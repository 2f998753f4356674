"""Plan inspection utilities (no custom Catalyst rules — SURVEY.md §4
established that stock Catalyst covers every optimization this engine
needs; what remains is *verifying* the plans are the ones we want)."""

from .audit import explain_formatted, plan_summary

__all__ = ["explain_formatted", "plan_summary"]
