"""CLI entry points mirroring the reference's repo-root scripts
(train.py / evaluate*.py, SURVEY.md §2.8)."""
