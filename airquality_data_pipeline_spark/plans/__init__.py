"""End-to-end pipeline compositions (the reference's entry points,
SURVEY.md §3, re-expressed as DataFrame plans)."""
