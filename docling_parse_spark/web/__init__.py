"""HTML main-content extraction (north-rule addition; no reference analog —
SURVEY.md §2.F)."""
