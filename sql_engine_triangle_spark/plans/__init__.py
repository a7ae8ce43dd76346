"""Physical-plan inspection helpers (SURVEY.md §4/§5: plan
assertions are first-class artifacts in the reference lab)."""
