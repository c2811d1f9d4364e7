"""vectors queries — filled in stages (SURVEY.md §7.2)."""
