"""Pipeline stages: each is a Dataset -> Dataset transform (SURVEY.md §7.1)."""
