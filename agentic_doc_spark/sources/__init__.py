"""Input resolution, connectors, and sinks (SURVEY.md §2.1)."""
