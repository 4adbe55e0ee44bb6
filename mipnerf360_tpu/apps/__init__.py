"""CLI entry points (L6 of SURVEY.md): train, eval, video."""
